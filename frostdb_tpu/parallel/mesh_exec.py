"""Distributed engine execution: the same ``scan_table(...).filter(...)
.aggregate(...)`` query, lowered onto a device mesh.

This is the engine integration of the distributed layer (SURVEY.md §2.8; the
role the reference's scan fan-out + Synchronizer barriers play,
physicalplan.go:22,322): when ``ExecOptions(mesh=...)`` is set, the engine
pattern-matches the optimized plan with ``compiled.match_plan`` and executes
it part by part as SPMD programs over the mesh —

  per-shard:   selection mask (the FULL compiled filter envelope fused:
               AND conjunctions of full-width int64 compares, dict/string
               predicates as replicated-LUT gathers, ==/!= null via
               validity) -> dense per-code partials (segment reductions;
               the non-final HashAggregate, aggregate.go:124)
  cross-shard: psum / pmin / pmax over the mesh axis (the final-stage
               Synchronizer, synchronize.go:16)

Results are BYTE-IDENTICAL to the generic single-stream engine on any
device count, including group emission order: each part program reduces the
exact first selected row per code (pmin across shards), parts accumulate a
global stream-position minimum on device, and groups emit in that
first-occurrence order (or key order under ordered_aggregations) —
device-count-independent by construction.

Scan state is INCREMENTAL per part (the reference's per-part LSM scan,
index/lsm.go:401): each immutable part caches one row-sharded device mirror
per (mesh, axis) (``Part.device_sharded``) that stays HBM-resident until
the part is dropped by compaction/rotation — an insert between two queries
uploads only the new part's columns, never the whole table. Partials
accumulate across parts on device and ONE replicated blob fetches per query.

Value columns reduce natively in int64 (no 32-bit digit envelope): sums,
min/max over nanosecond-magnitude spans, and integral float64 columns (the
shared exactness gate, compiled._check_parts_common) all distribute.

Group spaces are dense dictionary codes; the [K] partial tables are XLA
segment reductions, so K up to ~1M is fine (far past the Pallas one-hot
path's 2048). Beyond that, fall back to the generic engine (an all_to_all
repartition path à la shuffle.py would take over at that scale; frostdb
itself has no distributed execution at all).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..columnbatch import KIND_DICT, KIND_INT64
from ..compiled import CompiledFilterAggregate, NotCompilable, emit_output
from ..query import expr as E

# Sentinel for "no selected row yet" stream positions / min partials — the
# same headroom convention as ops/kernels.ident_like (values past 2^62 fall
# back to the generic engine, see _execute's range guard).
_BIG = 2**62

# Past this many codes the program reduces via sort + prefix sums
# (kernels.sorted_group_reduce) instead of scatter-lowered segment ops.
_SORTED_THRESHOLD = 4096

# (mesh id, axis, static program signature) -> jitted program. Shape/dtype
# specialization is jax.jit's own cache; this keys the *structure*.
_PROGRAM_CACHE: dict = {}


class MeshFilterAggregate(CompiledFilterAggregate):
    """One matched query over one table, executed across the mesh.

    Inherits the compiled path's plan validation, part pruning
    (_filter_parts), dictionary LUTs (_leaf_lut_np) and output emission;
    only the device execution differs: row-sharded parts, shard_map
    programs, int64-native reductions.
    """

    MAX_CODES = 1 << 20

    def __init__(self, spec, mesh, axis: str = "shards"):
        super().__init__(
            spec.table,
            spec.group_col,
            spec.aggs,
            spec.filter,
            spec.output_projection,
            ordered=spec.ordered,
            filter_expr=spec.filter_expr,
        )
        self.mesh = mesh
        self.axis = axis
        # A 1-device mesh needs no cross-shard combines — and the tunneled
        # single-chip TPU terminal only lowers Sum all-reduces, so pmin/pmax
        # must not appear in its programs (CLAUDE.md environment notes).
        self.trivial = mesh.shape[axis] == 1

    def _part_data(self, part):
        """The part's device mirror: row-sharded over the mesh (cached per
        (mesh, axis) on the part). The local dense tier overrides this to
        share the single-chip compiled path's ``part.device()`` cache."""
        return part.device_sharded(self.mesh, self.axis)

    # ------------------------------------------------------------------

    def _leaf_lut_mesh(self, idx: int):
        """Replicated device LUT for one dict leaf (the compiled path's
        _leaf_lut_dev, placed with a mesh-replicated sharding)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        cache = getattr(self, "_lut_mesh_cache", None)
        if cache is None:
            cache = self._lut_mesh_cache = {}
        leaf = self.filters[idx]
        key = (idx, len(leaf.dictionary))
        lut = cache.get(key)
        if lut is None:
            lut_np = self._leaf_lut_np(idx)
            lut = jax.device_put(
                lut_np, NamedSharding(self.mesh, P())
            )
            cache[key] = lut
        return lut

    def _put_replicated(self, arr):
        """LUT-like constants live mesh-replicated."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(arr, NamedSharding(self.mesh, P()))

    def _clause_layout(self, part) -> list:
        """Per-part static resolution of the CNF clauses: each entry is
        "true" (a missing all-true leaf makes the whole OR clause a no-op),
        "false" (every leaf missing and false — unreachable through
        _filter_parts, kept for direct callers), or a list of
        (leaf_index, sig) for the leaves present in the part."""
        from ..compiled import _missing_leaf_all_true

        layout = []
        for idxs in self.clauses:
            static_true = False
            present: list = []
            for i in idxs:
                leaf = self.filters[i]
                if part.batch.column(leaf.column) is None:
                    if _missing_leaf_all_true(leaf):
                        static_true = True
                        break
                    continue
                if leaf.kind == "int":
                    present.append((i, ("int", leaf.op)))
                elif leaf.lit is None:
                    present.append((i, ("nulllit", leaf.op)))
                else:
                    present.append((i, ("dict",)))
            if static_true:
                layout.append("true")
            elif not present:
                layout.append("false")
            else:
                layout.append(present)
        return layout

    def _part_signature(self, part) -> tuple:
        """Static program structure for one part: the clause layout (which
        filter leaves are present — missing dynamic columns resolve
        statically), the group-key plan shape, and the aggregation op
        list."""
        clause_sigs = tuple(
            lay
            if isinstance(lay, str)
            else tuple(sig for _i, sig in lay)
            for lay in self._clause_layout(part)
        )
        ops = tuple(
            (
                spec.func,
                self.value_plans[spec.column].is_float,
                self.value_plans[spec.column].fexact is not None,
            )
            if spec.func != E.AGG_COUNT
            else (E.AGG_COUNT, False, False)
            for spec in self.aggs
        )
        gshape = tuple(
            (gcol.kind, gcol.remap is not None, gcol.k)
            for gcol in self._gplan
        )
        return (clause_sigs, ops, gshape)

    def _program(self, sig: tuple, num_codes: int, per_shard: int):
        key = (id(self.mesh), self.axis, sig, num_codes, self.trivial)
        prog = _PROGRAM_CACHE.get(key)
        if prog is not None:
            return prog

        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        from ..ops import kernels as K

        clause_sigs, ops, gshape = sig
        axis = self.axis
        trivial = self.trivial
        psum = (lambda x, a: x) if trivial else jax.lax.psum
        pmin = (lambda x, a: x) if trivial else jax.lax.pmin
        pmax = (lambda x, a: x) if trivial else jax.lax.pmax

        def step(*xs):
            # xs layout: n, then per group col (dict: codes, valid, [remap]
            # | int: values, valid, window, base), then per present leaf
            # (int: fvals,fvalid,lit | nulllit: fvalid | dict:
            # fcodes,fvalid,lut), then per non-count agg (vals, vvalid).
            n = xs[0]
            i = 1
            gcodes = None
            gvalid = None
            for kind, has_remap, k in gshape:
                if kind == "int":
                    # Window code: value // w - base (runtime scalars, so a
                    # sliding time range never recompiles the program).
                    raw, v = xs[i], xs[i + 1]
                    win, base = xs[i + 2], xs[i + 3]
                    i += 4
                    c = jnp.clip(raw // win - base, 0, k - 1).astype(
                        jnp.int32
                    )
                else:
                    c, v = xs[i], xs[i + 1]
                    i += 2
                    if has_remap:
                        # Compact per-column code space (_group_remap): one
                        # replicated-LUT gather per row.
                        c = jnp.take(xs[i], c, mode="clip")
                        i += 1
                gcodes = c if gcodes is None else gcodes * jnp.int32(k) + c
                gvalid = v if gvalid is None else gvalid & v
            m = gcodes.shape[0]
            if trivial:
                rows = jnp.arange(m, dtype=jnp.int64)
            else:
                rows = (
                    jax.lax.axis_index(axis).astype(jnp.int64) * m
                    + jnp.arange(m, dtype=jnp.int64)
                )
            sel = gvalid & (rows < n)
            for clause_sig in clause_sigs:
                # CNF: AND of OR clauses (filter.go:167-229). "true" =
                # statically satisfied for this part (missing all-true
                # leaf); "false" = statically empty.
                if clause_sig == "true":
                    continue
                if clause_sig == "false":
                    sel = sel & False
                    continue
                cmask = None
                for leaf_sig in clause_sig:
                    if leaf_sig[0] == "int":
                        fv, fvalid, lit = xs[i], xs[i + 1], xs[i + 2]
                        i += 3
                        # Full-width int64 compare (x64 i64 is exact on
                        # TPU).
                        op = leaf_sig[1]
                        cmp = {
                            "<": fv < lit,
                            "<=": fv <= lit,
                            ">": fv > lit,
                            ">=": fv >= lit,
                            "==": fv == lit,
                            "!=": fv != lit,
                        }[op]
                        lm = cmp & fvalid
                    elif leaf_sig[0] == "nulllit":
                        # == null selects invalid slots, != null valid ones
                        # (binaryscalarexpr.go:205).
                        fvalid = xs[i]
                        i += 1
                        lm = (
                            fvalid
                            if leaf_sig[1] == E.OP_NOT_EQ
                            else ~fvalid
                        )
                    else:
                        fcodes, fvalid, lut = xs[i], xs[i + 1], xs[i + 2]
                        i += 3
                        lm = jnp.take(lut, fcodes, mode="clip") & fvalid
                    cmask = lm if cmask is None else (cmask | lm)
                sel = sel & cmask
            c32 = gcodes.astype(jnp.int32)
            vlist = []
            vops = []
            for func, _is_float, fexact in ops:
                if func == E.AGG_COUNT:
                    continue
                if fexact:
                    # Exact float64 sums: 3 base-2^28 digit planes + the
                    # SIGNED top plane, decomposed host-side
                    # (floatsum.decompose_np) and uploaded via the derived
                    # column cache; recombined host-side with ONE rounding.
                    for _p in range(4):
                        vlist.append(xs[i].astype(jnp.int64))
                        vops.append(K.AGG_SUM)
                        i += 1
                    continue
                v, _vvalid = xs[i], xs[i + 1]
                i += 2
                # integral floats ride the int path (shared exactness gate)
                vlist.append(v.astype(jnp.int64))
                vops.append(func)

            if num_codes > _SORTED_THRESHOLD:
                # Large-K: one sort + prefix sums beats XLA's scatter-based
                # segment reductions by orders of magnitude on TPU.
                counts_l, first_l, outs_l = K.sorted_group_reduce(
                    c32, sel, rows, tuple(vlist), num_codes, tuple(vops)
                )
                partials = list(outs_l)
            else:
                ones = jnp.ones(m, dtype=jnp.int64)
                counts_l = K.dense_group_reduce(
                    c32, ones, sel, num_codes, K.AGG_COUNT
                )
                first_l = K.dense_group_reduce(
                    c32, rows, sel, num_codes, K.AGG_MIN
                )
                partials = [
                    K.dense_group_reduce(c32, v, sel, num_codes, func)
                    for v, func in zip(vlist, vops)
                ]
            counts = psum(counts_l, axis)
            first = pmin(first_l, axis)
            outs = [counts, first]
            vi = 0
            for func, _is_float, fexact in ops:
                if func == E.AGG_COUNT:
                    outs.append(counts)
                    continue
                if fexact:
                    for _p in range(4):
                        outs.append(psum(partials[vi], axis))
                        vi += 1
                    continue
                partial = partials[vi]
                vi += 1
                if func == K.AGG_SUM:
                    outs.append(psum(partial, axis))
                elif func == K.AGG_MIN:
                    outs.append(pmin(partial, axis))
                else:
                    outs.append(pmax(partial, axis))
            return tuple(outs)

        if trivial:
            # 1-device mesh: the full array IS the shard; plain jit avoids
            # shard_map's replication inference on identity "collectives".
            prog = jax.jit(step)
        else:
            in_specs = [P()]
            for kind, has_remap, _k in gshape:
                if kind == "int":
                    in_specs += [P(axis), P(axis), P(), P()]
                else:
                    in_specs += [P(axis), P(axis)]
                    if has_remap:
                        in_specs.append(P())
            for clause_sig in clause_sigs:
                if isinstance(clause_sig, str):
                    continue
                for leaf_sig in clause_sig:
                    if leaf_sig[0] == "int":
                        in_specs += [P(axis), P(axis), P()]
                    elif leaf_sig[0] == "nulllit":
                        in_specs += [P(axis)]
                    else:
                        in_specs += [P(axis), P(axis), P()]
            for func, _is_float, fexact in ops:
                if func != E.AGG_COUNT:
                    if fexact:
                        in_specs += [P(axis)] * 4
                    else:
                        in_specs += [P(axis), P(axis)]
            n_out = 2 + sum(4 if f else 1 for _fn, _if, f in ops)
            prog = jax.jit(
                jax.shard_map(
                    step,
                    mesh=self.mesh,
                    in_specs=tuple(in_specs),
                    out_specs=tuple([P()] * n_out),
                )
            )
        _PROGRAM_CACHE[key] = prog
        return prog

    def _part_args(self, part, sp) -> list:
        """Flat argument list matching ``_part_signature``'s layout."""
        import jax.numpy as jnp

        args = [jnp.asarray(part.batch.num_rows, jnp.int64)]
        for gcol in self._gplan:
            g = sp.column(gcol.name)
            if gcol.kind == "int":
                args += [
                    g.data,
                    g.validity,
                    jnp.asarray(gcol.window, jnp.int64),
                    jnp.asarray(gcol.base, jnp.int64),
                ]
            else:
                args += [g.data, g.validity]
                if gcol.remap is not None:
                    args.append(self._remap_dev(gcol))
        for lay in self._clause_layout(part):
            if isinstance(lay, str):
                continue
            for i, _sig in lay:
                leaf = self.filters[i]
                f = sp.column(leaf.column)
                if leaf.kind == "int":
                    args += [
                        f.data,
                        f.validity,
                        jnp.asarray(leaf.lit, jnp.int64),
                    ]
                elif leaf.lit is None:
                    args += [f.validity]
                else:
                    args += [f.data, f.validity, self._leaf_lut_mesh(i)]
        for spec in self.aggs:
            if spec.func == E.AGG_COUNT:
                continue
            v = sp.column(spec.column)
            if v is None:
                raise NotCompilable(f"part lacks {spec.column}")
            plan = self.value_plans[spec.column]
            if plan.fexact is not None:
                # Four host-decomposed digit planes (floatsum.decompose_np;
                # TPU f64 arithmetic rounds, so on-device decomposition is
                # impossible), uploaded once per part via the derived-column
                # cache (top plane stays SIGNED — int64-native sums).
                from ..columnbatch import Column as _HC
                from ..floatsum import decompose_np

                col = spec.column
                scale = plan.fexact.scale

                def mk(pi, col=col, scale=scale, part=part, plan=plan):
                    def compute():
                        c = part.batch.column(col)
                        planes = decompose_np(c.values, plan.fexact)
                        return _HC(
                            f"{col}#fx{pi}@{scale}",
                            "int64",
                            planes[pi],
                            np.ones(len(planes[pi]), dtype=np.bool_),
                        )

                    return compute

                for pi in range(4):
                    dc = sp.derived(f"{col}#fx{pi}@{scale}", mk(pi))
                    args.append(dc.data)
            else:
                args += [v.data, v.validity]
        return args

    # ------------------------------------------------------------------

    def _execute(self):
        import jax.numpy as jnp

        from ..table import SourceWithoutBlockAPI

        tx = (
            self.table.db.high_watermark()
            if self.table.db is not None
            else 2**63
        )
        try:
            parts = self.table.collect_parts(tx, include_sources=True)
        except SourceWithoutBlockAPI:
            raise NotCompilable("a data source lacks the block API")
        parts = self._filter_parts(parts)
        ranges = self._check_parts_common(parts)
        for plan in self.value_plans.values():
            vmin, vmax = ranges.get(plan.column, (None, None))
            if plan.need_minmax and vmax is not None:
                if vmax >= _BIG or vmin <= -_BIG:
                    # Values past the segment-reduction identity headroom
                    # (ops/kernels.ident_like) — generic engine territory.
                    raise NotCompilable("min/max values near int64 sentinel")
        self._gplan, num_codes = self._group_remap(parts)

        result_names = [spec.result_name for spec in self.aggs]
        if not parts:
            empty = np.asarray([], dtype=np.int64)
            return emit_output(
                self._emitted_group_cols(empty),
                empty,
                result_names,
                {n: np.zeros(num_codes, np.int64) for n in result_names},
                self.output_projection,
            )

        counts_total = jnp.zeros((num_codes,), jnp.int64)
        global_first = jnp.full((num_codes,), _BIG, jnp.int64)
        acc: dict[str, Optional[object]] = {n: None for n in result_names}
        offset = 0
        for p in parts:
            sp = self._part_data(p)
            sig = self._part_signature(p)
            prog = self._program(sig, num_codes, getattr(sp, "per_shard", 0))
            outs = prog(*self._part_args(p, sp))
            counts_p, first_p = outs[0], outs[1]
            counts_total = counts_total + counts_p
            global_first = jnp.minimum(
                global_first,
                jnp.where(
                    counts_p > 0, first_p + jnp.int64(offset), jnp.int64(_BIG)
                ),
            )
            oi = 2
            for spec in self.aggs:
                name = spec.result_name
                prev = acc[name]
                if (
                    spec.func != E.AGG_COUNT
                    and self.value_plans[spec.column].fexact is not None
                ):
                    planes = list(outs[oi : oi + 4])
                    oi += 4
                    acc[name] = (
                        planes
                        if prev is None
                        else [a + b for a, b in zip(prev, planes)]
                    )
                    continue
                out_p = outs[oi]
                oi += 1
                if spec.func in (E.AGG_SUM, E.AGG_COUNT):
                    acc[name] = out_p if prev is None else prev + out_p
                elif spec.func == E.AGG_MIN:
                    acc[name] = (
                        out_p if prev is None else jnp.minimum(prev, out_p)
                    )
                else:
                    acc[name] = (
                        out_p if prev is None else jnp.maximum(prev, out_p)
                    )
            offset += p.batch.num_rows

        # ONE device->host fetch for the whole query (each fetch is a full
        # ~25 ms RTT sync through the axon tunnel).
        blob_entries = [counts_total, global_first]
        for n in result_names:
            a = acc[n]
            blob_entries.extend(a if isinstance(a, list) else [a])
        blob = np.asarray(jnp.concatenate(blob_entries))
        counts_np = blob[:num_codes]
        first_np = blob[num_codes : 2 * num_codes]
        by_name: dict[str, np.ndarray] = {}
        off = 2 * num_codes
        for j, name in enumerate(result_names):
            spec = self.aggs[j]
            plan = (
                self.value_plans.get(spec.column)
                if spec.func != E.AGG_COUNT
                else None
            )
            if plan is not None and plan.fexact is not None:
                from ..floatsum import recombine

                pls = []
                for _pi in range(4):
                    pls.append(blob[off : off + num_codes])
                    off += num_codes
                by_name[name] = recombine(pls, plan.fexact)
                continue
            vals = blob[off : off + num_codes]
            off += num_codes
            if plan is not None and plan.is_float:
                vals = vals.astype(np.float64)
            by_name[name] = vals

        # Group emission order = first occurrence among selected rows of the
        # concatenated part stream (matching kernels.group_ids); each row
        # has exactly one code so stream positions are distinct.
        present = np.nonzero(counts_np > 0)[0]
        order_arr = present[np.argsort(first_np[present], kind="stable")]
        order_arr = self._ordered_sort(order_arr.astype(np.int64))

        return emit_output(
            self._emitted_group_cols(order_arr),
            order_arr,
            result_names,
            by_name,
            self.output_projection,
        )


def lower_plan_mesh(plan, exec_options) -> MeshFilterAggregate:
    """Match an optimized plan onto the mesh executor; raises NotCompilable
    when the shape doesn't hold (engine falls back to compiled/generic)."""
    from ..compiled import match_plan

    spec = match_plan(plan, exec_options)
    return MeshFilterAggregate(
        spec, exec_options.mesh, exec_options.mesh_axis
    )


# ---------------------------------------------------------------------------
# Local dense tier: the single-chip large-K path


_LOCAL_MESH = None


def _local_mesh():
    global _LOCAL_MESH
    if _LOCAL_MESH is None:
        from .mesh import make_mesh

        _LOCAL_MESH = make_mesh(1)
    return _LOCAL_MESH


class DenseLocalAggregate(MeshFilterAggregate):
    """Single-chip dense tier between the Pallas compiled path and the
    generic engine: the same int64 XLA segment-reduction program as the
    trivial-mesh executor, run over the table's ``part.device()`` cache —
    so group-bys past the one-hot kernel's 2048-code ceiling (up to ~1M
    compact codes) stay device-resident across queries instead of
    re-uploading host concats per query (VERDICT r2 weak 3; the role of
    aggregate.go's unbounded group map)."""

    def __init__(self, spec):
        super().__init__(spec, _local_mesh(), "shards")

    def _part_data(self, part):
        # Share the compiled path's per-part device cache: one upload
        # serves both tiers.
        return part.device()


def lower_plan_dense(plan, exec_options) -> DenseLocalAggregate:
    """The engine's large-K fallback: same matched shape, dense int64
    segment reductions on the default device."""
    from ..compiled import match_plan

    return DenseLocalAggregate(match_plan(plan, exec_options))
