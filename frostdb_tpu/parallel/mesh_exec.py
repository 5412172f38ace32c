"""Distributed engine execution: the same ``scan_table(...).filter(...)
.aggregate(...)`` query, lowered onto a device mesh.

This is the engine integration of the distributed layer (SURVEY.md §2.8; the
role the reference's scan fan-out + Synchronizer barriers play,
physicalplan.go:22,322): when ``ExecOptions(mesh=...)`` is set, the engine
pattern-matches the optimized plan with ``compiled.match_plan`` and executes
it as one SPMD program over the mesh —

  per-shard:   selection mask (filter fused) -> dense per-code partials
               (segment reductions; the non-final HashAggregate,
               aggregate.go:124)
  cross-shard: psum / pmin / pmax over the mesh axis (the final-stage
               Synchronizer, synchronize.go:16)

Results are BYTE-IDENTICAL to the generic single-stream engine on any
device count, including group emission order: every row carries its
original stream position, the kernel reduces the min selected position per
code (pmin across shards), and groups emit in that first-occurrence order
(or key order under ordered_aggregations) — device-count-independent by
construction.

The table's visible parts are concatenated once per parts-version and kept
as a row-sharded ``PartitionedTable`` in HBM across queries; the shard_map
program caches per (mesh, spec signature, shapes) so repeat queries reuse
the compiled executable.

Group spaces are dense dictionary codes; the [K] partial tables are XLA
segment reductions, so K up to ~1M is fine (far past the Pallas one-hot
path's 2048). Beyond that, fall back to the generic engine (an
all_to_all repartition path à la shuffle.py would take over at that
scale; frostdb itself has no distributed execution at all).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from ..compiled import FastPlanSpec, NotCompilable, emit_output
from ..query import expr as E
from .mesh import PartitionedTable

_ROWID = "__rowid__"
_MAX_DENSE_CODES = 1 << 20

# (mesh, axis, ops, filter_op, num_codes, n_value_cols) -> jitted shard_map
_PROGRAM_CACHE: dict = {}


class MeshFilterAggregate:
    """One matched query over one table, executed across the mesh."""

    def __init__(self, spec: FastPlanSpec, mesh, axis: str = "shards"):
        self.spec = spec
        self.mesh = mesh
        self.axis = axis
        self.table = spec.table

        schema = self.table.schema()
        gdef = schema.column_by_name(spec.group_col)
        if gdef is None or gdef.layout.type != "string":
            raise NotCompilable(
                f"group column {spec.group_col} is not dict-coded"
            )
        fam = spec.group_col.split(".", 1)[0]
        self.dictionary = self.table.dictionary(fam)
        if len(self.dictionary) > _MAX_DENSE_CODES:
            raise NotCompilable("code space too large for dense mesh partials")

        self.aggs: list[tuple[str, str, str]] = []
        for func, col, result_name in spec.aggs:
            if func not in (E.AGG_SUM, E.AGG_COUNT, E.AGG_MIN, E.AGG_MAX):
                raise NotCompilable(f"agg {func} not in mesh set")
            if func != E.AGG_COUNT:
                vdef = schema.column_by_name(col)
                if vdef is not None and vdef.layout.type != "int64":
                    raise NotCompilable("mesh aggs reduce int columns")
            self.aggs.append((func, col, result_name))
        # spec.filter is an AND-conjunction leaf list (compiled.match_plan);
        # the mesh program fuses a single int comparison — wider filters
        # fall through to the single-chip compiled path, which handles
        # conjunctions and dict predicates.
        self.filter = None
        if spec.filter:
            if len(spec.filter) != 1:
                raise NotCompilable("mesh filter is a single comparison")
            fcol, fop, lit = spec.filter[0]
            if fop not in ("<", "<=", ">", ">=", "==", "!="):
                raise NotCompilable(f"filter op {fop} not comparable")
            fdef = schema.column_by_name(fcol)
            if fdef is None or fdef.layout.type != "int64":
                raise NotCompilable("mesh filters compare int columns")
            if not isinstance(lit, int) or isinstance(lit, bool):
                raise NotCompilable("mesh filter literal is not an int")
            self.filter = (fcol, fop, lit)

    # ------------------------------------------------------------------

    def _needed_columns(self) -> list[str]:
        cols = [self.spec.group_col]
        for func, col, _name in self.aggs:
            if func != E.AGG_COUNT and col not in cols:
                cols.append(col)
            # count(col) needs the column only for its own existence; the
            # generic engine counts selected rows of the part stream, so
            # the group/filter masks suffice.
        if self.filter is not None and self.filter[0] not in cols:
            cols.append(self.filter[0])
        return cols

    def _partitioned(self, parts) -> PartitionedTable:
        """Row-sharded device table of the visible parts, cached per
        parts-version on the table (rebuilt only when the visible part set
        changes — insert/compaction/rotation)."""
        needed = tuple(self._needed_columns())
        key = (
            id(self.mesh),
            self.axis,
            needed,
            tuple(id(p) for p in parts),
        )
        cache = getattr(self.table, "_mesh_tables", None)
        if cache is None:
            cache = self.table._mesh_tables = {}
        pt = cache.get(key)
        if pt is not None:
            return pt

        from ..query.physical import unify_concat

        merged = unify_concat([p.batch for p in parts])
        n = merged.num_rows
        cols = []
        for name in needed:
            c = merged.column(name)
            if c is None:
                raise NotCompilable(f"parts lack column {name}")
            if name == self.spec.group_col and not c.validity.all():
                # The generic engine emits a null-key group; fall back.
                raise NotCompilable("null group keys (generic engine path)")
            cols.append(c)
        cols.append(
            Column(
                _ROWID,
                KIND_INT64,
                np.arange(n, dtype=np.int64),
                np.ones(n, dtype=bool),
            )
        )
        pt = PartitionedTable.from_batch(
            ColumnBatch(cols, n), self.mesh, self.axis
        )
        cache.clear()  # one live partitioning per table keeps HBM bounded
        cache[key] = pt
        return pt

    def _program(self, num_codes: int, n_pad: int):
        ops = tuple(func for func, _c, _n in self.aggs)
        fop = self.filter[1] if self.filter is not None else None
        key = (id(self.mesh), self.axis, ops, fop, num_codes, n_pad)
        prog = _PROGRAM_CACHE.get(key)
        if prog is not None:
            return prog

        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        from ..ops import kernels as K

        axis = self.axis
        has_filter = fop is not None
        # A 1-device mesh needs no cross-shard combines — and the tunneled
        # single-chip TPU terminal only lowers Sum all-reduces, so pmin/pmax
        # must not appear in its programs (CLAUDE.md environment notes).
        trivial = self.mesh.shape[axis] == 1
        psum = (lambda x, a: x) if trivial else jax.lax.psum
        pmin = (lambda x, a: x) if trivial else jax.lax.pmin
        pmax = (lambda x, a: x) if trivial else jax.lax.pmax

        def step(*xs):
            # xs layout: codes, gvalid, rowid, rowvalid,
            #            [fvals, fvalid, flit], then per-agg (vals, valid)
            codes, gvalid, rowid, rowvalid = xs[:4]
            i = 4
            sel = gvalid & rowvalid
            if has_filter:
                fv, fvalid, flit = xs[i], xs[i + 1], xs[i + 2]
                i += 3
                sel = sel & fvalid & K.compare_scalar_mask(
                    fv, fvalid, flit, fop
                )
            c32 = codes.astype(jnp.int32)
            outs = []
            for op in ops:
                v, _vvalid = xs[i], xs[i + 1]
                i += 2
                if op == K.AGG_COUNT:
                    v = jnp.ones_like(rowid)
                partial = K.dense_group_reduce(c32, v, sel, num_codes, op)
                if op in (K.AGG_SUM, K.AGG_COUNT):
                    outs.append(psum(partial, axis))
                elif op == K.AGG_MIN:
                    outs.append(pmin(partial, axis))
                else:
                    outs.append(pmax(partial, axis))
            counts = psum(
                K.dense_group_reduce(
                    c32, jnp.ones_like(rowid), sel, num_codes, K.AGG_COUNT
                ),
                axis,
            )
            first = pmin(
                K.dense_group_reduce(c32, rowid, sel, num_codes, K.AGG_MIN),
                axis,
            )
            # Single replicated blob: one device->host fetch per query.
            return jnp.concatenate(
                [o.astype(jnp.int64) for o in outs] + [counts, first]
            )

        if trivial:
            # 1-device mesh: the full array IS the shard; plain jit avoids
            # shard_map's replication inference on identity "collectives".
            prog = jax.jit(step)
        else:
            n_in = 4 + (3 if has_filter else 0) + 2 * len(ops)
            in_specs = [P(axis)] * n_in
            if has_filter:
                in_specs[6] = P()  # the literal is replicated
            prog = jax.jit(
                jax.shard_map(
                    step,
                    mesh=self.mesh,
                    in_specs=tuple(in_specs),
                    out_specs=P(),
                )
            )
        _PROGRAM_CACHE[key] = prog
        return prog

    # ------------------------------------------------------------------

    def execute(self) -> ColumnBatch:
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
        num_codes = max(len(self.dictionary), 1)
        if not parts:
            return emit_output(
                self.spec.group_col,
                self.dictionary,
                np.asarray([], dtype=np.int64),
                [n for _f, _c, n in self.aggs],
                {n: np.zeros(num_codes, np.int64) for _f, _c, n in self.aggs},
                self.spec.output_projection,
            )

        pt = self._partitioned(parts)
        g = pt.column(self.spec.group_col)
        rid = pt.column(_ROWID)
        args = [g.data, g.validity, rid.data, rid.validity]
        if self.filter is not None:
            fcol, _fop, lit = self.filter
            f = pt.column(fcol)
            args += [f.data, f.validity, jnp.asarray(lit, jnp.int64)]
        for func, col, _name in self.aggs:
            c = pt.column(col if func != E.AGG_COUNT else _ROWID)
            args += [c.data, c.validity]

        prog = self._program(num_codes, pt.n_pad)
        blob = np.asarray(prog(*args))

        off = 0
        by_name: dict[str, np.ndarray] = {}
        for _func, _col, name in self.aggs:
            by_name[name] = blob[off : off + num_codes]
            off += num_codes
        counts = blob[off : off + num_codes]
        off += num_codes
        first = blob[off : off + num_codes]

        present = np.nonzero(counts > 0)[0]
        order_arr = present[np.argsort(first[present], kind="stable")]
        if self.spec.ordered and len(order_arr):
            ranks = self.dictionary.sort_ranks()
            order_arr = order_arr[
                np.argsort(ranks[order_arr], kind="stable")
            ]

        return emit_output(
            self.spec.group_col,
            self.dictionary,
            order_arr.astype(np.int64),
            [n for _f, _c, n in self.aggs],
            by_name,
            self.spec.output_projection,
        )


def lower_plan_mesh(plan, exec_options) -> MeshFilterAggregate:
    """Match an optimized plan onto the mesh executor; raises NotCompilable
    when the shape doesn't hold (engine falls back to compiled/generic)."""
    from ..compiled import match_plan

    spec = match_plan(plan, exec_options)
    return MeshFilterAggregate(
        spec, exec_options.mesh, exec_options.mesh_axis
    )
