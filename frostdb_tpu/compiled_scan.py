"""Device-resident filter -> project serving (VERDICT r3 item 4).

Non-aggregate row retrieval — ``scan.filter(...).project(...)`` — used to
execute 100% on the host (query/physeval.py numpy masks) even though every
part caches a device mirror. Here the O(n) part of the query runs on the
TPU: ONE jitted program evaluates the compiled CNF selection mask over the
cached superpart planes and compacts the selected row positions with a
static-size ``nonzero`` (the selection-mask -> row-materialization step the
reference performs with roaring bitmaps + IndexRanges,
query/physicalplan/filter.go:276-354). The host then materializes ONLY the
selected rows per part (numpy ``take`` on O(selected) rows, dictionary
codes decode host-side) and applies the projection with the SAME
``project_expr`` evaluation the generic Projection operator uses — so
emitted rows, row order, per-part batch boundaries, and missing-dynamic-
column semantics are byte-identical to the generic engine.

Static shapes: the compaction capacity starts small and escalates to the
next power of two when a query selects more rows (the count rides in the
same fetch, so the common low-selectivity serving case pays one dispatch +
one small fetch); executables cache per (structure, capacity).
"""

from __future__ import annotations

import numpy as np

from .compiled import (
    CompiledFilterAggregate,
    NotCompilable,
    _dev_scalar,
    _missing_leaf_all_true,
)
from .query import expr as E

# (structure, capb, n_blocks) -> jitted selection program.
_SCAN_CACHE: dict = {}

# Per-block compaction capacity: starts small (low-selectivity serving),
# escalates by powers of two; past _CAPB_MAX the host evaluates just the
# overflowing blocks (bounded work — see _execute_into).
_CAPB0 = 16
_CAPB_MAX = 1024


def _build_scan_program(structure, capb: int, n_blocks: int):
    """Selection + per-block compaction. A global static-size compaction
    (jnp.nonzero / cumsum+scatter) measures 100-1500 ms on this TPU for
    16.7M rows; batched per-block ``top_k`` over [blocks, 8192] runs in
    ~12 ms and its stable ties return ascending row positions — stream
    order (the reference's IndexRanges materialization order,
    filter.go:305). Returns [bc (n_blocks) | idx2d (n_blocks*capb)] int32:
    per-block selected counts and the first capb selected positions per
    block (-1 padded)."""
    import jax
    import jax.numpy as jnp

    from .ops.pallas_agg import ROWS_PER_SUPER

    clauses, on_tpu = structure

    def fn(*xs):
        i = 0
        sel = xs[i]  # rowvalid plane
        i += 1
        for cl in clauses:
            cmask = None
            for leaf in cl:
                if leaf[0] == "int":
                    fv, fvalid, has, lit = (
                        xs[i],
                        xs[i + 1],
                        xs[i + 2],
                        xs[i + 3],
                    )
                    i += 4
                    op = leaf[1]
                    cmp = {
                        "<": fv < lit,
                        "<=": fv <= lit,
                        ">": fv > lit,
                        ">=": fv >= lit,
                        "==": fv == lit,
                        "!=": fv != lit,
                    }[op]
                    m = cmp.astype(jnp.int32) * fvalid
                    static = leaf[2]
                elif leaf[0] == "nulllit":
                    fvalid, has = xs[i], xs[i + 1]
                    i += 2
                    m = fvalid if leaf[1] == E.OP_NOT_EQ else (1 - fvalid)
                    static = leaf[2]
                else:
                    fcodes, fvalid, has, lut = (
                        xs[i],
                        xs[i + 1],
                        xs[i + 2],
                        xs[i + 3],
                    )
                    i += 4
                    m = jnp.take(lut, fcodes, mode="clip") * fvalid
                    static = leaf[1]
                m = jnp.where(has == 1, m, 1 if static else 0)
                cmask = m if cmask is None else jnp.maximum(cmask, m)
            sel = sel * cmask
        if on_tpu:
            # Pallas per-block compaction (triangular-matmul prefix sums +
            # one-hot extraction): XLA's global compaction ops measure
            # 12-1500 ms for 16.7M rows here; the kernel is bandwidth-bound.
            from .ops.pallas_agg import pallas_block_compact

            bc, idx = pallas_block_compact(sel, capb)
        else:
            m2 = sel.reshape(n_blocks, ROWS_PER_SUPER)
            bc = m2.sum(axis=1, dtype=jnp.int32)
            v, idx = jax.lax.top_k(m2, capb)
            idx = jnp.where(v > 0, idx, -1).astype(jnp.int32)
        return jnp.concatenate([bc, idx.reshape(-1)])

    return jax.jit(fn)


class CompiledScan(CompiledFilterAggregate):
    """Filter -> project over one table's device-cached parts. Shares the
    aggregate path's leaf validation, CNF clause layout, part pruning,
    dictionary LUTs, and superpart plane caches; only the program and the
    host materialization differ."""

    def __init__(
        self,
        table,
        projection_exprs,
        physical_projection,
        filter_spec,
        filter_expr,
        limit: int | None = None,
    ):
        import jax

        self.limit = limit  # first-n truncation (limit.go:17 semantics)
        self.table = table
        self.on_tpu = jax.default_backend() == "tpu"
        self.projection_exprs = projection_exprs  # None = no Projection node
        self.physical_projection = list(physical_projection or ())
        # No group keys on this path; parent helpers expect the fields.
        self._gplan = []
        self.group_cols = []
        self.group_dicts = []
        self.value_plans = {}
        self.aggs = []
        schema = table.schema()
        self.filters = []
        self.clauses = []
        self.filter_expr = filter_expr
        for clause in filter_spec:
            leaves = [clause] if isinstance(clause, tuple) else list(clause)
            idxs = []
            for fcol, fop, lit in leaves:
                idxs.append(len(self.filters))
                self.filters.append(self._make_leaf(schema, fcol, fop, lit))
            self.clauses.append(idxs)
        if not self.clauses:
            # An unfiltered scan selects everything: the device saves no
            # bytes and the host materializes all rows anyway.
            raise NotCompilable("unfiltered scan (generic path)")

    # -- device selection --------------------------------------------------

    def _scan_structure(self, sp) -> tuple:
        cl = []
        for idxs in self.clauses:
            leafs = []
            for i in idxs:
                leaf = self.filters[i]
                static = _missing_leaf_all_true(leaf)
                if leaf.kind == "int":
                    leafs.append(
                        ("int", leaf.op, static, self._leaf_i32_ok(sp, leaf))
                    )
                elif leaf.lit is None:
                    leafs.append(("nulllit", leaf.op, static))
                else:
                    leafs.append(("dict", static))
            cl.append(tuple(leafs))
        return (tuple(cl), self.on_tpu)

    def _scan_args(self, sp) -> list:
        import jax.numpy as jnp

        args = [self._sp_plane(sp, "rowvalid", None)]
        for idxs in self.clauses:
            for i in idxs:
                leaf = self.filters[i]
                if leaf.kind == "int":
                    if self._leaf_i32_ok(sp, leaf):
                        args += [
                            self._sp_i32_m(sp, leaf.column),
                            self._sp_plane(sp, "valid_m", leaf.column),
                            self._sp_plane(sp, "has", leaf.column),
                            _dev_scalar(leaf.lit, jnp.int32),
                        ]
                    else:
                        args += [
                            self._sp_plane(sp, "int64_m", leaf.column),
                            self._sp_plane(sp, "valid_m", leaf.column),
                            self._sp_plane(sp, "has", leaf.column),
                            _dev_scalar(leaf.lit, jnp.int64),
                        ]
                elif leaf.lit is None:
                    args += [
                        self._sp_plane(sp, "valid_m", leaf.column),
                        self._sp_plane(sp, "has", leaf.column),
                    ]
                else:
                    args += [
                        self._sp_plane(sp, "codes_m", leaf.column),
                        self._sp_plane(sp, "valid_m", leaf.column),
                        self._sp_plane(sp, "has", leaf.column),
                        self._leaf_lut_dev(i),
                    ]
        return args

    def _run_scan_program(self, sp, capb: int) -> np.ndarray:
        from .ops.pallas_agg import ROWS_PER_SUPER

        structure = self._scan_structure(sp)
        n_blocks = int(sp["row_offsets"][-1]) // ROWS_PER_SUPER
        key = (structure, capb, n_blocks)
        prog = _SCAN_CACHE.get(key)
        if prog is None:
            prog = _SCAN_CACHE[key] = _build_scan_program(
                structure, capb, n_blocks
            )
        return np.asarray(prog(*self._scan_args(sp)))

    def _selected_rows(self, sp, parts) -> np.ndarray:
        """Global selected row positions (ascending) over the superpart
        plane space. Three regimes per block: fully selected blocks need
        no per-row data (an arange), blocks within the per-block capacity
        come from the device top_k, and oversized partial blocks either
        escalate the capacity (one more dispatch) or — past _CAPB_MAX —
        are re-filtered HOST-side over just those blocks' rows (bounded:
        range predicates have <= 2 boundary blocks per part)."""
        from .ops.pallas_agg import ROWS_PER_SUPER

        RB = ROWS_PER_SUPER
        offsets = sp["row_offsets"]
        n_blocks = int(offsets[-1]) // RB
        # Start at the capacity the LAST query with this structure settled
        # on (cached per table): serving workloads repeat their shapes, and
        # a capacity escalation costs a second device dispatch — a full
        # tunnel round trip (measured: the macro filter->project query paid
        # 2 RTTs every time at the default capacity).
        cache = getattr(self.table, "_scan_capb_cache", None)
        if cache is None:
            cache = self.table._scan_capb_cache = {}
        ckey = self._scan_structure(sp)
        capb = min(max(cache.get(ckey, _CAPB0), _CAPB0), _CAPB_MAX)
        blob = self._run_scan_program(sp, capb)
        bc = blob[:n_blocks]
        idx2d = blob[n_blocks:].reshape(n_blocks, capb)
        partial = (bc > capb) & (bc < RB)
        if partial.any():
            mx = int(bc[partial].max())
            if mx <= _CAPB_MAX:
                capb = 1 << (mx - 1).bit_length()
                blob = self._run_scan_program(sp, capb)
                bc = blob[:n_blocks]
                idx2d = blob[n_blocks:].reshape(n_blocks, capb)
                partial = (bc > capb) & (bc < RB)
        cache[ckey] = capb
        pieces: list[np.ndarray] = []
        for b in np.nonzero(bc > 0)[0]:
            base = b * RB
            n_sel = int(bc[b])
            if n_sel == RB:
                pieces.append(np.arange(base, base + RB, dtype=np.int64))
            elif n_sel <= idx2d.shape[1]:
                pieces.append(
                    idx2d[b, :n_sel].astype(np.int64) + base
                )
            else:
                # Host re-filter of this block's real rows — identical
                # semantics via the generic engine's own mask evaluation.
                from .query.physeval import filter_mask

                pi = int(np.searchsorted(offsets, base, side="right")) - 1
                p = parts[pi]
                lo = base - int(offsets[pi])
                hi = min(lo + RB, p.batch.num_rows)
                rows = p.batch.take(np.arange(lo, hi, dtype=np.int64))
                mask = filter_mask(rows, self.filter_expr)
                pieces.append(np.flatnonzero(mask).astype(np.int64) + base)
        if not pieces:
            return np.zeros(0, dtype=np.int64)
        return np.concatenate(pieces)

    # -- execution ---------------------------------------------------------

    def execute_into(self, callback) -> None:
        from .tracing import span as _span

        with _span("compiled_scan/execute", table=self.table.name):
            self._execute_into(callback)

    def _execute_into(self, callback) -> None:
        from .query.physeval import project_expr
        from .columnbatch import ColumnBatch
        from .table import SourceWithoutBlockAPI

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
        # Column-kind validation against the leaves (the aggregate path's
        # gate minus group/value checks).
        for p in parts:
            for leaf in self.filters:
                f = p.batch.column(leaf.column)
                if f is None:
                    continue
                from .columnbatch import KIND_DICT, KIND_INT64

                if leaf.kind == "int":
                    if f.kind != KIND_INT64:
                        raise NotCompilable("filter column kind mismatch")
                elif f.kind != KIND_DICT:
                    raise NotCompilable("filter column kind mismatch")
        if not parts:
            return
        sp = self._superpart(parts)
        idx = self._selected_rows(sp, parts)
        charged = 0
        if self.allocator is not None:
            # selected-position transient (query/memory.go:17); charged
            # BEFORE the limit slice (the full vector was materialized) and
            # freed in a finally so neither the early empty-return nor an
            # epilogue error can leak the reservation
            charged = int(idx.nbytes)
            self.allocator.allocate(charged)
        try:
            self._materialize(sp, parts, idx, callback)
        finally:
            if self.allocator is not None and charged:
                self.allocator.free(charged)

    def _materialize(self, sp, parts, idx, callback) -> None:
        from .query.physeval import project_expr
        from .columnbatch import ColumnBatch

        if self.limit is not None:
            # Selected positions are ascending stream order, so the first n
            # are exactly what the generic Limiter chain emits (per-lane
            # Limiters then the post-Synchronizer Limiter slice the ordered
            # stream, limit.go:17) — host materialization is bounded by n.
            idx = idx[: max(self.limit, 0)]
        if len(idx) == 0:
            return
        offsets = sp["row_offsets"]
        # Split global positions into per-part local rows; emit one batch
        # per part with >= 1 selected row, in part-stream order — exactly
        # the generic lane-ordered filter -> projection emission.
        bounds = np.searchsorted(idx, offsets[1:-1])
        pieces = np.split(idx, bounds)
        for pi, (p, local) in enumerate(zip(parts, pieces)):
            if len(local) == 0:
                continue
            local = local - int(offsets[pi])
            batch = p.batch.take(local.astype(np.int64))
            if self.physical_projection:
                batch = self.table._apply_physical_projection(
                    batch, self.physical_projection
                )
            if self.projection_exprs is not None:
                cols = []
                seen: set[str] = set()
                for e in self.projection_exprs:
                    for c in project_expr(batch, e):
                        if c.name in seen:
                            continue
                        seen.add(c.name)
                        cols.append(c)
                batch = ColumnBatch(cols, batch.num_rows)
            if self.allocator is not None:
                # transient flow accounting, like PredicateFilter: charged
                # while the materialized batch is in flight
                nbytes = sum(
                    c.values.nbytes + c.validity.nbytes
                    for c in batch.columns
                )
                self.allocator.allocate(nbytes)
                try:
                    callback(batch)
                finally:
                    self.allocator.free(nbytes)
                continue
            callback(batch)


def match_plan_scan(plan, exec_options=None) -> CompiledScan:
    """Match an optimized non-aggregate plan: TableScan <- Filter
    [<- Projection] [<- Limit]. Anything else (distinct, sample, joins,
    aggregations, unfiltered scans) stays on the generic engine."""
    node = plan
    limit = None
    if node is not None and node.limit is not None:
        lim_e = node.limit.expr
        if not isinstance(lim_e, E.Literal) or not isinstance(
            lim_e.value, int
        ):
            raise NotCompilable("limit is not an int literal")
        limit = int(lim_e.value)
        node = node.input
    proj_exprs = None
    if node is not None and node.projection is not None:
        proj_exprs = list(node.projection.exprs)
        node = node.input
    filt = None
    while node is not None and node.filter is not None:
        if filt is not None:
            raise NotCompilable("multiple filter nodes")
        filt = node.filter.expr
        node = node.input
    if node is None or node.table_scan is None:
        raise NotCompilable("input is not a plain filtered table scan")
    if filt is None:
        raise NotCompilable("unfiltered scan (generic path)")
    scan = node.table_scan
    table = scan.provider.get_table(scan.table_name)
    if table is None:
        raise NotCompilable(f"table not found: {scan.table_name}")

    # CNF flattening — the same shape match_plan applies.
    conjuncts: list = []

    def flatten(e) -> None:
        if isinstance(e, E.BinaryExpr) and e.op == E.OP_AND:
            flatten(e.left)
            flatten(e.right)
            return
        conjuncts.append(e)

    def leaf_tuple(e):
        if not (
            isinstance(e, E.BinaryExpr)
            and type(e.left) is E.Column
            and isinstance(e.right, E.Literal)
        ):
            raise NotCompilable("filter is not a CNF of col <op> literal")
        return (e.left.column_name, e.op, e.right.value)

    def flatten_or(e, out: list) -> None:
        if isinstance(e, E.BinaryExpr) and e.op == E.OP_OR:
            flatten_or(e.left, out)
            flatten_or(e.right, out)
            return
        out.append(leaf_tuple(e))

    flatten(filt)
    filter_spec: list = []
    for e in conjuncts:
        if isinstance(e, E.BinaryExpr) and e.op == E.OP_OR:
            ors: list = []
            flatten_or(e, ors)
            filter_spec.append(ors)
        else:
            filter_spec.append(leaf_tuple(e))

    return CompiledScan(
        table,
        proj_exprs,
        scan.physical_projection,
        filter_spec,
        filt,
        limit=limit,
    )


def lower_plan_scan(plan, exec_options=None) -> CompiledScan:
    obj = match_plan_scan(plan, exec_options)
    if exec_options is not None:
        obj.allocator = exec_options.allocator
    return obj
