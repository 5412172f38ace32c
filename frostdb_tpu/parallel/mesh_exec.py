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


def _op_width(func, fexact: bool) -> int:
    """Number of [K] partial vectors one aggregation spec contributes:
    exact-float sums carry 4 digit planes; unique carries (min, max,
    valid-count); everything else (incl. count, which re-emits the shared
    counts) carries one."""
    if fexact:
        return 4
    if func == E.AGG_UNIQUE:
        return 3
    return 1

# Shuffle-tier ceiling: K up to 2^27 combined codes aggregate via the
# pair-exchange path with O(K/shards) per-shard tables; beyond that the
# generic engine serves (VERDICT r3 item 6).
SHUFFLE_MAX_CODES = 1 << 27


def _unpack_inputs(xs, gshape, clause_sigs, ops, axis, trivial):
    """Shared SPMD input unpacking for the dense and shuffle shard programs:
    group-code build (dict remaps / window codes), CNF selection mask,
    global stream positions, and the per-aggregation value list (incl.
    exact-float digit planes). Returns (next_arg_index, gcodes, sel, rows,
    vlist, vops)."""
    import jax
    import jax.numpy as jnp

    from ..ops import kernels as K

    n = xs[0]
    i = 1
    gcodes = None
    gvalid = None
    for kind, has_remap, k in gshape:
        if kind == "int":
            raw, v = xs[i], xs[i + 1]
            win, base = xs[i + 2], xs[i + 3]
            i += 4
            c = jnp.clip(raw // win - base, 0, k - 1).astype(jnp.int32)
        else:
            c, v = xs[i], xs[i + 1]
            i += 2
            if has_remap:
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
                fvalid = xs[i]
                i += 1
                lm = fvalid if leaf_sig[1] == E.OP_NOT_EQ else ~fvalid
            else:
                fcodes, fvalid, lut = xs[i], xs[i + 1], xs[i + 2]
                i += 3
                lm = jnp.take(lut, fcodes, mode="clip") & fvalid
            cmask = lm if cmask is None else (cmask | lm)
        sel = sel & cmask
    vlist = []
    vops = []
    vfmm = []
    for func, _is_float, fexact, fmm in ops:
        if func == E.AGG_COUNT:
            continue
        if fexact:
            for _p in range(4):
                vlist.append(xs[i].astype(jnp.int64))
                vops.append(K.AGG_SUM)
                vfmm.append(False)
                i += 1
            continue
        v, vvalid = xs[i], xs[i + 1]
        i += 2
        if func == E.AGG_UNIQUE:
            # unique = (min == max) & (valid-slot count == group count);
            # three plain reductions (kernels.segment_agg AGG_UNIQUE
            # decomposed), combined in the host epilogue.
            vlist += [
                v.astype(jnp.int64),
                v.astype(jnp.int64),
                vvalid.astype(jnp.int64),
            ]
            vops += [K.AGG_MIN, K.AGG_MAX, K.AGG_SUM]
            vfmm += [False, False, False]
            continue
        if func == E.AGG_AND:
            # and = per-group min of (valid ? v : 1) — nulls true-neutral
            # (aggregate.go:798).
            vlist.append(
                jnp.where(vvalid, v.astype(jnp.int64), jnp.int64(1))
            )
            vops.append(K.AGG_MIN)
            vfmm.append(False)
            continue
        vlist.append(v.astype(jnp.int64))
        vops.append(func)
        vfmm.append(fmm)
    return i, gcodes, sel, rows, vlist, vops, vfmm


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
                spec.func == E.AGG_SUM
                and self.value_plans[spec.column].fexact is not None,
                spec.func in (E.AGG_MIN, E.AGG_MAX)
                and self.value_plans[spec.column].fmm,
            )
            if spec.func != E.AGG_COUNT
            else (E.AGG_COUNT, False, False, False)
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
            # fcodes,fvalid,lut), then per non-count agg (vals, vvalid /
            # fexact: 4 digit planes) — unpacked by _unpack_inputs.
            _i, gcodes, sel, rows, vlist, vops, vfmm = _unpack_inputs(
                xs, gshape, clause_sigs, ops, axis, trivial
            )
            c32 = gcodes.astype(jnp.int32)
            _I64_MAX = jnp.int64(2**63 - 1)
            _I64_MIN = jnp.int64(-(2**63))
            sorted_path = num_codes > _SORTED_THRESHOLD
            fmm_global: dict = {}
            if sorted_path:
                # Large-K: one sort + prefix sums beats XLA's scatter-based
                # segment reductions by orders of magnitude on TPU. Its
                # min/max take the segment's first/last SORTED element, so
                # full-range monotone float keys (fmm) are sentinel-safe —
                # but shard-local EMPTY groups hold the +-2^62 identity,
                # which transformed keys can exceed; widen those slots to
                # int64 extremes before the cross-shard combine.
                counts_l, first_l, outs_l = K.sorted_group_reduce(
                    c32, sel, rows, tuple(vlist), num_codes, tuple(vops)
                )
                partials = list(outs_l)
                for vi2, (func, fmm) in enumerate(zip(vops, vfmm)):
                    if not fmm:
                        continue
                    ident = _I64_MAX if func == K.AGG_MIN else _I64_MIN
                    partials[vi2] = jnp.where(
                        counts_l > 0, partials[vi2], ident
                    )
            else:
                ones = jnp.ones(gcodes.shape[0], dtype=jnp.int64)
                counts_l = K.dense_group_reduce(
                    c32, ones, sel, num_codes, K.AGG_COUNT
                )
                first_l = K.dense_group_reduce(
                    c32, rows, sel, num_codes, K.AGG_MIN
                )
                partials = []
                for vi2, (v, func) in enumerate(zip(vlist, vops)):
                    if vfmm[vi2]:
                        # Monotone float keys span past the +-2^62 reduce
                        # identities; reduce lexicographically as (hi, lo)
                        # int32-range halves with the cross-shard combine
                        # folded in (the compiled wide-min/max pattern).
                        hi = v >> jnp.int64(32)
                        lo = v & jnp.int64(0xFFFFFFFF)
                        hi_l = K.dense_group_reduce(
                            c32, hi, sel, num_codes, func
                        )
                        g_hi = (
                            pmin(hi_l, axis)
                            if func == K.AGG_MIN
                            else pmax(hi_l, axis)
                        )
                        sel2 = sel & (hi == jnp.take(g_hi, c32, mode="clip"))
                        lo_l = K.dense_group_reduce(
                            c32, lo, sel2, num_codes, func
                        )
                        g_lo = (
                            pmin(lo_l, axis)
                            if func == K.AGG_MIN
                            else pmax(lo_l, axis)
                        )
                        fmm_global[vi2] = (g_hi << jnp.int64(32)) | g_lo
                        partials.append(None)
                        continue
                    partials.append(
                        K.dense_group_reduce(c32, v, sel, num_codes, func)
                    )
            counts = psum(counts_l, axis)
            first = pmin(first_l, axis)
            outs = [counts, first]
            vi = 0
            for func, _is_float, fexact, fmm in ops:
                if func == E.AGG_COUNT:
                    outs.append(counts)
                    continue
                if fexact:
                    for _p in range(4):
                        outs.append(psum(partials[vi], axis))
                        vi += 1
                    continue
                if fmm and vi in fmm_global:
                    # already globally combined; empty groups clamp so the
                    # cross-part accumulate never sees wrapped sentinels
                    ident = (
                        _I64_MAX if func == E.AGG_MIN else _I64_MIN
                    )
                    outs.append(
                        jnp.where(counts > 0, fmm_global[vi], ident)
                    )
                    vi += 1
                    continue
                if func == E.AGG_UNIQUE:
                    outs.append(pmin(partials[vi], axis))
                    outs.append(pmax(partials[vi + 1], axis))
                    outs.append(psum(partials[vi + 2], axis))
                    vi += 3
                    continue
                if func == E.AGG_AND:
                    outs.append(pmin(partials[vi], axis))
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
            for func, _is_float, fexact, _fmm in ops:
                if func != E.AGG_COUNT:
                    if fexact:
                        in_specs += [P(axis)] * 4
                    else:
                        in_specs += [P(axis), P(axis)]
            n_out = 2 + sum(_op_width(fn, f) for fn, _if, f, _m in ops)
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
            if spec.func in (E.AGG_MIN, E.AGG_MAX) and plan.fmm:
                # monotone int64 key plane (host-transformed, cached):
                # k = bits ^ ((bits >> 63) & 0x7FF..F) orders exactly like
                # the doubles; decode inverts the same transform.
                col = spec.column

                def mk_fmm(col=col, part=part):
                    def compute():
                        from ..columnbatch import Column as _HC

                        c = part.batch.column(col)
                        b = np.ascontiguousarray(
                            c.values, dtype=np.float64
                        ).view(np.int64)
                        k = b ^ ((b >> 63) & np.int64(0x7FFFFFFFFFFFFFFF))
                        return _HC(
                            f"{col}#fmm",
                            "int64",
                            k,
                            np.ones(len(k), dtype=np.bool_),
                        )

                    return compute

                dc = sp.derived(f"{col}#fmm", mk_fmm())
                args += [dc.data, dc.validity]
                continue
            if spec.func == E.AGG_SUM and plan.fexact is not None:
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

    def _shuffle_program(self, sig, num_codes: int, k_per: int, cap: int):
        """One part's shuffle-tier shard program: local SPARSE sort-reduce
        of selected rows into (code, count, first, partials) pairs (each
        key appears at most once per sender, so a heavy key cannot overflow
        a destination), mod-n_shards all_to_all pair exchange, then
        owner-side scatter into carried [k_per]-sharded dense tables —
        per-shard memory O(K/shards), never a replicated [K] array."""
        key = (
            id(self.mesh),
            self.axis,
            sig,
            num_codes,
            k_per,
            cap,
            self.trivial,
            "shuffle",
        )
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
        n_shards = 1 if trivial else self.mesh.shape[axis]
        n_aggv = sum(
            _op_width(fn, f)
            for fn, _if, f, _m in ops
            if fn != E.AGG_COUNT
        )

        def step(*xs):
            i, gcodes, sel, rows, vlist, vops, vfmm = _unpack_inputs(
                xs, gshape, clause_sigs, ops, axis, trivial
            )
            tabs = list(xs[i : i + 2 + n_aggv])
            over_in = xs[i + 2 + n_aggv]
            # Global stream position: the tables accumulate ACROSS parts
            # inside the program, so each part's rows shift by its offset
            # in the concatenated stream (the dense path adds it outside).
            offset = xs[i + 3 + n_aggv]
            rows = rows + offset
            m = gcodes.shape[0]
            big = jnp.int64(num_codes)

            # local sparse reduce: sort rows by code (invalid last),
            # segment per distinct code — pair arrays are [m]-shaped with
            # the valid prefix holding one entry per local distinct key.
            keyv = jnp.where(sel, gcodes.astype(jnp.int64), big)
            order = jnp.argsort(keyv, stable=True)
            ks = jnp.take(keyv, order)
            rows_s = jnp.take(rows, order)
            boundary = (
                jnp.concatenate(
                    [jnp.ones((1,), jnp.bool_), ks[1:] != ks[:-1]]
                )
                & (ks < big)
            )
            seg = jnp.clip(
                jnp.cumsum(boundary.astype(jnp.int32)) - 1, 0, m - 1
            )
            valid_row = ks < big
            pcode = jax.ops.segment_min(
                jnp.where(valid_row, ks, big), seg, num_segments=m
            )
            pcount = jax.ops.segment_sum(
                jnp.where(valid_row, jnp.int64(1), jnp.int64(0)),
                seg,
                num_segments=m,
            )
            pfirst = jax.ops.segment_min(
                jnp.where(valid_row, rows_s, _BIG), seg, num_segments=m
            )
            ppart = []
            _I64MAX = jnp.int64(2**63 - 1)
            _I64MIN = jnp.int64(-(2**63))
            for v, func, fmm2 in zip(vlist, vops, vfmm):
                # fmm (monotone float ordering keys) span the FULL int64
                # range, so their reduce identities must be the int64
                # extremes — +-2^62 would clobber large-magnitude keys.
                # (The only colliding bit patterns are all-ones-mantissa
                # NaNs, which decode back to those same NaNs.)
                imin = _I64MAX if fmm2 else _BIG
                imax = _I64MIN if fmm2 else -_BIG
                v_s = jnp.take(v, order)
                if func == K.AGG_SUM:
                    ppart.append(
                        jax.ops.segment_sum(
                            jnp.where(valid_row, v_s, jnp.int64(0)),
                            seg,
                            num_segments=m,
                        )
                    )
                elif func == K.AGG_MIN:
                    ppart.append(
                        jax.ops.segment_min(
                            jnp.where(valid_row, v_s, imin),
                            seg,
                            num_segments=m,
                        )
                    )
                else:
                    ppart.append(
                        jax.ops.segment_max(
                            jnp.where(valid_row, v_s, imax),
                            seg,
                            num_segments=m,
                        )
                    )
            pvalid = pcount > 0

            cols = [pcode, pcount, pfirst] + ppart
            if trivial:
                r_cols = cols
                r_valid = pvalid
                overflow = jnp.int32(0)
            else:
                # pair exchange: dest = code % n_shards (owner shard);
                # gather-packed fixed-capacity buckets + all_to_all
                # (shuffle.py's exchange, on pairs instead of rows).
                dest = jnp.where(
                    pvalid,
                    (pcode % n_shards).astype(jnp.int32),
                    jnp.int32(n_shards),
                )
                order2 = jnp.argsort(dest, stable=True)
                dsorted = jnp.take(dest, order2)
                counts2 = jax.ops.segment_sum(
                    jnp.ones_like(dsorted, dtype=jnp.int32),
                    dsorted,
                    num_segments=n_shards + 1,
                )[:n_shards]
                starts = jnp.concatenate(
                    [
                        jnp.zeros((1,), jnp.int32),
                        jnp.cumsum(counts2)[:-1].astype(jnp.int32),
                    ]
                )
                overflow = jax.lax.pmax(
                    (counts2 > cap).any().astype(jnp.int32), axis
                )
                out_idx = jnp.arange(n_shards * cap, dtype=jnp.int32)
                b = out_idx // cap
                pslot = out_idx % cap
                srci = jnp.clip(starts[b] + pslot, 0, m - 1)
                in_bucket = pslot < counts2[b]
                r_cols = []
                for c in cols:
                    c_s = jnp.take(c, order2)
                    packed = jnp.where(
                        in_bucket, jnp.take(c_s, srci), jnp.zeros_like(c)[
                            :1
                        ].repeat(n_shards * cap)
                    )
                    r_cols.append(
                        jax.lax.all_to_all(
                            packed.reshape(n_shards, cap),
                            axis,
                            0,
                            0,
                            tiled=False,
                        ).reshape(-1)
                    )
                # packed slots hold valid pairs exactly where in_bucket
                # (invalid pairs sorted past every destination's range).
                r_valid = jax.lax.all_to_all(
                    in_bucket.reshape(n_shards, cap),
                    axis,
                    0,
                    0,
                    tiled=False,
                ).reshape(-1)

            # owner scatter into the carried [k_per] tables
            rcode = r_cols[0]
            slot = jnp.where(
                r_valid, (rcode // n_shards).astype(jnp.int32), jnp.int32(k_per)
            )
            counts_tab, first_tab = tabs[0], tabs[1]
            counts_tab = counts_tab.at[slot].add(
                jnp.where(r_valid, r_cols[1], jnp.int64(0)), mode="drop"
            )
            first_tab = first_tab.at[slot].min(
                jnp.where(r_valid, r_cols[2], _BIG), mode="drop"
            )
            out_tabs = [counts_tab, first_tab]
            for vi, (func, fmm2) in enumerate(zip(vops, vfmm)):
                t = tabs[2 + vi]
                rv2 = r_cols[3 + vi]
                if func == K.AGG_SUM:
                    t = t.at[slot].add(
                        jnp.where(r_valid, rv2, jnp.int64(0)), mode="drop"
                    )
                elif func == K.AGG_MIN:
                    t = t.at[slot].min(
                        jnp.where(r_valid, rv2, _I64MAX if fmm2 else _BIG),
                        mode="drop",
                    )
                else:
                    t = t.at[slot].max(
                        jnp.where(r_valid, rv2, _I64MIN if fmm2 else -_BIG),
                        mode="drop",
                    )
                out_tabs.append(t)
            over_out = jnp.maximum(over_in, overflow)
            if not trivial:
                over_out = jax.lax.pmax(over_out, axis)
            return tuple(out_tabs) + (over_out,)

        if trivial:
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
            for func, _is_float, fexact, _fmm in ops:
                if func != E.AGG_COUNT:
                    if fexact:
                        in_specs += [P(axis)] * 4
                    else:
                        in_specs += [P(axis), P(axis)]
            in_specs += [P(axis)] * (2 + n_aggv)  # carried tables
            in_specs += [P(), P()]  # overflow carry, part stream offset
            out_specs = tuple([P(axis)] * (2 + n_aggv)) + (P(),)
            prog = jax.jit(
                jax.shard_map(
                    step,
                    mesh=self.mesh,
                    in_specs=tuple(in_specs),
                    out_specs=out_specs,
                )
            )
        _PROGRAM_CACHE[key] = prog
        return prog

    def _execute_shuffle(self, parts, num_codes: int):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_shards = 1 if self.trivial else self.mesh.shape[self.axis]
        k_per = -(-num_codes // n_shards)
        k_per = ((k_per + 127) // 128) * 128
        k_pad = k_per * n_shards
        n_aggv = sum(
            _op_width(
                s.func, self.value_plans[s.column].fexact is not None
            )
            for s in self.aggs
            if s.func != E.AGG_COUNT
        )
        shard_spec = (
            None
            if self.trivial
            else NamedSharding(self.mesh, P(self.axis))
        )

        def put(arr):
            a = jnp.asarray(arr)
            return a if shard_spec is None else jax.device_put(a, shard_spec)

        oversub = 2.0
        for _attempt in range(4):
            max_rows = max(
                (p.batch.num_rows for p in parts), default=1
            )
            per_shard = -(-max_rows // n_shards)
            cap = max(int(np.ceil(per_shard / n_shards * oversub / 128)) * 128, 128)
            tabs = [
                put(np.zeros(k_pad, np.int64)),  # counts
                put(np.full(k_pad, _BIG, np.int64)),  # first
            ]
            # per-agg tables with op-appropriate identities (fmm ordering
            # keys span full int64 -> int64-extreme identities)
            agg_ops_flat = []  # (op, fmm)
            for spec in self.aggs:
                if spec.func == E.AGG_COUNT:
                    continue
                plan2 = self.value_plans[spec.column]
                if plan2.fexact is not None:
                    agg_ops_flat += [(E.AGG_SUM, False)] * 4
                elif spec.func == E.AGG_UNIQUE:
                    agg_ops_flat += [
                        (E.AGG_MIN, False),
                        (E.AGG_MAX, False),
                        (E.AGG_SUM, False),
                    ]
                elif spec.func == E.AGG_AND:
                    agg_ops_flat.append((E.AGG_MIN, False))
                else:
                    agg_ops_flat.append((spec.func, plan2.fmm))
            _I64MAX = 2**63 - 1
            _I64MIN = -(2**63)
            for fn, fmm2 in agg_ops_flat:
                if fn == E.AGG_MIN:
                    tabs.append(
                        put(np.full(k_pad, _I64MAX if fmm2 else _BIG, np.int64))
                    )
                elif fn == E.AGG_MAX:
                    tabs.append(
                        put(np.full(k_pad, _I64MIN if fmm2 else -_BIG, np.int64))
                    )
                else:
                    tabs.append(put(np.zeros(k_pad, np.int64)))
            over = jnp.int32(0)
            offset = 0
            for p in parts:
                sp = self._part_data(p)
                sig = self._part_signature(p)
                prog = self._shuffle_program(sig, num_codes, k_per, cap)
                outs = prog(
                    *self._part_args(p, sp),
                    *tabs,
                    over,
                    jnp.asarray(offset, jnp.int64),
                )
                tabs = list(outs[:-1])
                over = outs[-1]
                offset += p.batch.num_rows
            blob = np.asarray(jnp.concatenate([over[None].astype(jnp.int64)] + tabs))
            if int(blob[0]) == 0:
                break
            oversub *= 2.0
        else:
            raise NotCompilable("shuffle-tier pair exchange overflow")
        if self.allocator is not None:
            self.allocator.allocate(int(blob.nbytes))
        try:
            return self._shuffle_epilogue(blob, num_codes, k_per, k_pad, n_shards)
        finally:
            if self.allocator is not None:
                self.allocator.free(int(blob.nbytes))

    def _shuffle_epilogue(self, blob, num_codes, k_per, k_pad, n_shards):
        # host assembly: global slot g on shard j = g // k_per holds code
        # (g % k_per) * n_shards + j
        g = np.arange(k_pad, dtype=np.int64)
        codes_of_g = (g % k_per) * n_shards + (g // k_per)
        in_range = codes_of_g < num_codes
        body = blob[1:]

        def table(ti, fill):
            t = body[ti * k_pad : (ti + 1) * k_pad]
            full = np.full(num_codes, fill, np.int64)
            full[codes_of_g[in_range]] = t[in_range]
            return full

        counts_np = table(0, 0)
        first_np = table(1, _BIG)
        by_name: dict[str, np.ndarray] = {}
        ti = 2
        for spec in self.aggs:
            name = spec.result_name
            if spec.func == E.AGG_COUNT:
                by_name[name] = counts_np
                continue
            plan = self.value_plans[spec.column]
            if plan.fexact is not None:
                from ..floatsum import recombine

                pls = [table(ti + pi, 0) for pi in range(4)]
                ti += 4
                by_name[name] = recombine(pls, plan.fexact)
                continue
            if spec.func == E.AGG_UNIQUE:
                mn = table(ti, _BIG)
                mx = table(ti + 1, -_BIG)
                vc = table(ti + 2, 0)
                ti += 3
                uvalid = (mn == mx) & (vc == counts_np)
                by_name[name] = (np.where(uvalid, mn, 0), uvalid)
                continue
            if spec.func == E.AGG_AND:
                vals = table(ti, _BIG)
                ti += 1
                by_name[name] = (vals > 0).astype(np.bool_)
                continue
            vals = table(ti, 0)
            ti += 1
            if spec.func in (E.AGG_MIN, E.AGG_MAX) and plan.fmm:
                # invert the monotone transform, reinterpret as float64
                k2 = vals.astype(np.int64)
                b = k2 ^ ((k2 >> 63) & np.int64(0x7FFFFFFFFFFFFFFF))
                by_name[name] = b.view(np.float64)
                continue
            if plan.is_float:
                vals = vals.astype(np.float64)
            by_name[name] = vals

        present = np.nonzero(counts_np > 0)[0]
        order_arr = present[np.argsort(first_np[present], kind="stable")]
        order_arr = self._ordered_sort(order_arr.astype(np.int64))
        out = emit_output(
            self._emitted_group_cols(order_arr),
            order_arr,
            [spec.result_name for spec in self.aggs],
            by_name,
            self.output_projection,
        )
        if self.allocator is not None:
            self.allocator.free(int(blob.nbytes))
        return out

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
        try:
            self._gplan, num_codes = self._group_remap(parts)
        except NotCompilable as e:
            if "group code space" not in str(e):
                raise
            # Shuffle tier (VERDICT r3 item 6): past the replicated-[K]
            # ceiling, aggregate via local sparse reduce + all_to_all pair
            # exchange + owner-sharded dense tables of O(K/shards) memory
            # per shard (the role of aggregate.go:430-470's overflow
            # splitting, distributed).
            self._gplan, num_codes = self._group_remap(
                parts, max_codes=SHUFFLE_MAX_CODES
            )
            return self._execute_shuffle(parts, num_codes)

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
                    spec.func == E.AGG_SUM
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
                if spec.func == E.AGG_UNIQUE:
                    mn_p, mx_p, vc_p = outs[oi : oi + 3]
                    oi += 3
                    acc[name] = (
                        [mn_p, mx_p, vc_p]
                        if prev is None
                        else [
                            jnp.minimum(prev[0], mn_p),
                            jnp.maximum(prev[1], mx_p),
                            prev[2] + vc_p,
                        ]
                    )
                    continue
                out_p = outs[oi]
                oi += 1
                if spec.func in (E.AGG_SUM, E.AGG_COUNT):
                    acc[name] = out_p if prev is None else prev + out_p
                elif spec.func in (E.AGG_MIN, E.AGG_AND):
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
        if self.allocator is not None:
            # per-query transient accounting (query/memory.go:17); freed in
            # a finally so an epilogue error cannot leak the reservation
            self.allocator.allocate(int(blob.nbytes))
        try:
            return self._dense_epilogue(blob, num_codes, result_names)
        finally:
            if self.allocator is not None:
                self.allocator.free(int(blob.nbytes))

    def _dense_epilogue(self, blob, num_codes, result_names):
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
            if (
                spec.func == E.AGG_SUM
                and plan is not None
                and plan.fexact is not None
            ):
                from ..floatsum import recombine

                pls = []
                for _pi in range(4):
                    pls.append(blob[off : off + num_codes])
                    off += num_codes
                by_name[name] = recombine(pls, plan.fexact)
                continue
            if spec.func == E.AGG_UNIQUE:
                mn = blob[off : off + num_codes]
                mx = blob[off + num_codes : off + 2 * num_codes]
                vc = blob[off + 2 * num_codes : off + 3 * num_codes]
                off += 3 * num_codes
                uvalid = (mn == mx) & (vc == counts_np)
                by_name[name] = (np.where(uvalid, mn, 0), uvalid)
                continue
            if spec.func == E.AGG_AND:
                vals = blob[off : off + num_codes]
                off += num_codes
                by_name[name] = (vals > 0).astype(np.bool_)
                continue
            vals = blob[off : off + num_codes]
            off += num_codes
            if (
                spec.func in (E.AGG_MIN, E.AGG_MAX)
                and plan is not None
                and plan.fmm
            ):
                # invert the monotone transform and reinterpret as f64
                k = vals.astype(np.int64)
                b = k ^ ((k >> 63) & np.int64(0x7FFFFFFFFFFFFFFF))
                by_name[name] = b.view(np.float64)
                continue
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
    obj = MeshFilterAggregate(
        spec, exec_options.mesh, exec_options.mesh_axis
    )
    obj.allocator = exec_options.allocator
    return obj


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

    obj = DenseLocalAggregate(match_plan(plan, exec_options))
    if exec_options is not None:
        obj.allocator = exec_options.allocator
    return obj
