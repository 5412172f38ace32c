"""Compiled serving queries: filter + group-aggregate lowered onto the
fused device kernels over a table's device-cached parts.

This is the production serving path for the engine's hot query shape (the
reference's Merge/Range queries, bench_test.go:299): the generic operator
pipeline (query/physical.py) is exact and fully general; this layer applies
when the planner can PROVE the fast pattern:

- group keys are table-global dictionary codes with a combined code space
  <= 2048 (the kernel lane-tiles one accumulator tile per 128 codes),
- aggregations are sum/count/min/max of an int column whose raw-value
  *span* (max - min over all visible parts) fits 32 bits — negative and
  large-magnitude columns (e.g. nanosecond timestamps) are shifted by the
  global minimum on device and reconstructed exactly as
  ``kernel_sum + bias * count`` (the shift is order-preserving, so min/max
  just add the bias back),
- the filter is a single comparison on a numeric column (fused into the
  kernel) or absent,
- no null group keys (those fall back to the generic engine, which emits
  the null-key group).

Persisted blocks (bucket/iceberg sources) participate through the table's
source-part cache (table.source_parts): each block is read once, split at
row-group granularity, and cached as immutable device-resident parts — so
the fast path survives block rotation (the reference's bucket block
cache/dedup, store.go:123,143).

The engine integrates this automatically: ``lower_plan`` pattern-matches an
optimized logical plan and ``LocalQueryBuilder.execute`` falls back to the
generic operator pipeline on ``NotCompilable`` (the optimizer-directed
lowering the reference performs with readmode pushdowns in
pqarrow/arrow.go:171-205, done here for the aggregation hot loop).

Results are EXACTLY the generic engine's, including group emission order:
the engine emits groups by first occurrence among *selected* (post-filter)
rows of the concatenated part stream. On TPU the kernel's per-superblock
count partials give each code's first selected superblock for free; ties
within one superblock are refined host-side over just those <= 8192 rows.

Parts stay device-resident between queries (lsm.Part.device() caches the
upload); each part aggregates on device and partials combine with int64
adds on [K]-sized vectors — the same two-phase shape the distributed layer
uses across chips (parallel/distributed.py).

On non-TPU backends the same contract runs through the XLA one-hot
formulation (ops/fused.py), so results are identical everywhere.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from .columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from .query import expr as E

_INT32_MIN = -(2**31)
_INT32_MAX = 2**31 - 1


class NotCompilable(Exception):
    """The query does not match the compiled fast pattern; callers fall back
    to the generic engine."""


@dataclass
class _AggSpec:
    func: str  # "sum" | "count"
    column: str
    result_name: str


def _digits_for(max_value: int) -> int:
    d = 1
    lim = 127
    while lim < max_value:
        lim = lim * 128 + 127
        d += 1
    if d > 7:
        raise NotCompilable("value range needs >7 base-128 digits")
    return d


class CompiledFilterAggregate:
    """Compiled ``select <aggs> where <col> <op> <lit> group by <dict col>``
    over one table."""

    def __init__(
        self,
        table,
        group_col: str,
        aggs: Sequence[tuple],  # (func, column[, result_name])
        filter: Optional[tuple[str, str, int]] = None,  # (col, op, literal)
        output_projection: Optional[Sequence[tuple]] = None,
        ordered: bool = False,
    ):
        # ordered: emit groups in key order (string-value asc) instead of
        # first-occurrence order — set exactly when the generic planner
        # would pick OrderedAggregate (physical._should_plan_ordered), so
        # results stay byte-identical to the operator DAG either way.
        self.ordered = ordered
        # output_projection: post-aggregation output spec (the avg rewrite's
        # ``sum(x)/count(x) as avg(x)`` projection, builder.go:152-238):
        #   ("group",)                     the group column
        #   ("col", out_name, src_name)    an agg result, possibly renamed
        #   ("div", out_name, sum, count)  truncating int division on the
        #                                  [K]-sized host partials
        self.output_projection = (
            list(output_projection) if output_projection is not None else None
        )
        import jax

        self.table = table
        self.group_col = group_col
        self.filter = filter
        self.on_tpu = jax.default_backend() == "tpu"

        schema = table.schema()
        gdef = schema.column_by_name(group_col)
        if gdef is None or gdef.layout.type != "string":
            raise NotCompilable(f"group column {group_col} is not dict-coded")
        fam = group_col.split(".", 1)[0]
        self.dictionary = table.dictionary(fam)
        if len(self.dictionary) > 2048:
            # The Pallas kernel lane-tiles the code space (one accumulator
            # tile per 128 codes); past ~16 tiles the dense one-hot N*K term
            # loses to the generic sort-based engine.
            raise NotCompilable("code space > 2048 (dense one-hot limit)")

        self.aggs = []
        self.value_col: Optional[str] = None
        self.need_minmax = False
        for spec in aggs:
            func, col = spec[0], spec[1]
            result_name = spec[2] if len(spec) > 2 else f"{func}({col})"
            if func not in (E.AGG_SUM, E.AGG_COUNT, E.AGG_MIN, E.AGG_MAX):
                raise NotCompilable(f"agg {func} not in compiled set")
            if func in (E.AGG_MIN, E.AGG_MAX):
                self.need_minmax = True
            if func != E.AGG_COUNT:
                if self.value_col is not None and self.value_col != col:
                    raise NotCompilable("one value column per compiled query")
                vdef = schema.column_by_name(col)
                if vdef is not None and vdef.layout.type != "int64":
                    raise NotCompilable("compiled aggs are int columns")
                self.value_col = col
            self.aggs.append(_AggSpec(func, col, result_name))
        if self.filter is not None:
            fcol, fop, lit = self.filter
            if fop not in ("<", "<=", ">", ">=", "==", "!="):
                raise NotCompilable(f"filter op {fop} not comparable")
            fdef = schema.column_by_name(fcol)
            if fdef is None or fdef.layout.type != "int64":
                raise NotCompilable("compiled filters compare int columns")
            if not (_INT32_MIN <= lit <= _INT32_MAX):
                raise NotCompilable("filter literal outside int32 range")

    # ------------------------------------------------------------------

    def _check_parts(self, parts) -> tuple[int, int]:
        """Host-metadata validation over the visible parts; returns
        ``(num_digits, bias)`` for the summed column. All checks read cached
        per-part ranges / validity flags, never full columns per query.

        ``bias`` is the global raw minimum: the kernel sums ``v - bias``
        (always non-negative, often far fewer base-128 digits — e.g.
        nanosecond timestamps) and the exact sum is reconstructed as
        ``kernel_sum + bias * count``. This admits negative and
        large-magnitude int64 columns as long as the *span* fits 32 bits."""
        num_digits = 2
        vmin: Optional[int] = None
        vmax: Optional[int] = None
        for p in parts:
            g = p.batch.column(self.group_col)
            if g is None:
                raise NotCompilable(f"part lacks {self.group_col}")
            if not g.validity.all():
                # The generic engine emits a null-key group for these rows
                # (kernels.group_ids keys on validity); fall back.
                raise NotCompilable("null group keys (generic engine path)")
            if self.value_col is not None:
                c = p.batch.column(self.value_col)
                if c is None:
                    raise NotCompilable(f"part lacks {self.value_col}")
                if c.kind != KIND_INT64:
                    raise NotCompilable("compiled sums are int columns")
                r = p.raw_range(self.value_col)
                if r is not None:
                    # Raw buffer bounds: null slots participate in sums
                    # exactly like the reference's raw-buffer sum
                    # (aggregate.go:763), so they bound the digits too.
                    vmin = r[0] if vmin is None else min(vmin, r[0])
                    vmax = r[1] if vmax is None else max(vmax, r[1])
            else:
                # counts-only queries still need every part to carry the
                # counted rows; nothing to bound.
                pass
            if self.filter is not None:
                fcol = self.filter[0]
                f = p.batch.column(fcol)
                if f is None:
                    raise NotCompilable(f"part lacks {fcol}")
                r = p.raw_range(fcol)
                if r is not None and not (
                    _INT32_MIN <= r[0] and r[1] <= _INT32_MAX
                ):
                    raise NotCompilable("filter column outside int32 range")
        bias = 0
        if self.value_col is not None and vmin is not None:
            span = vmax - vmin
            if span > _INT32_MAX:
                raise NotCompilable("value span exceeds 32 bits")
            # Bias only when needed (negative values, or values past the
            # kernel's int32 input range); zero-bias keeps sums independent
            # of counts for columns that are already small non-negative ints.
            if vmin < 0 or vmax > _INT32_MAX:
                bias = vmin
            num_digits = _digits_for(max(vmax - bias, 1))
        return num_digits, bias

    def _part_arrays(self, part, bias: int = 0):
        """Device arrays for one part in kernel layout, via the part's
        cached device batch. Rows pad to the kernel's superblock. The summed
        column is shifted by ``-bias`` (sums reconstructed downstream as
        ``kernel_sum + bias * count``)."""
        import jax.numpy as jnp

        from .ops.pallas_agg import ROWS_PER_SUPER

        dev = part.device()
        g = dev.column(self.group_col)
        if g is None:
            raise NotCompilable(f"part lacks {self.group_col}")
        n_pad = dev.n_pad
        target = -(-n_pad // ROWS_PER_SUPER) * ROWS_PER_SUPER

        def pad2d(a, fill=0):
            if a.shape[0] < target:
                a = jnp.concatenate(
                    [a, jnp.full((target - a.shape[0],), fill, a.dtype)]
                )
            return a.reshape(target // 128, 128)

        codes = pad2d(g.data.astype(jnp.int32))
        gvalid = pad2d(g.validity.astype(jnp.int32))
        if self.value_col is not None:
            v = dev.column(self.value_col)
            if v is None:
                raise NotCompilable(f"part lacks {self.value_col}")
            vdata = v.data
            if bias:
                vdata = vdata - jnp.asarray(bias, vdata.dtype)
            vals = pad2d(vdata.astype(jnp.int32))
        else:
            vals = pad2d(jnp.zeros((n_pad,), jnp.int32))
        row_valid = pad2d(dev.row_valid_mask().astype(jnp.int32))
        sel = row_valid * gvalid
        if self.filter is not None:
            fcol, fop, lit = self.filter
            f = dev.column(fcol)
            if f is None:
                raise NotCompilable(f"part lacks {fcol}")
            fv = pad2d(f.data.astype(jnp.int32))
            fvalid = pad2d(f.validity.astype(jnp.int32))
            cmp = {
                "<": fv < lit,
                "<=": fv <= lit,
                ">": fv > lit,
                ">=": fv >= lit,
                "==": fv == lit,
                "!=": fv != lit,
            }[fop]
            sel = sel * cmp.astype(jnp.int32) * fvalid
        return codes, vals, sel

    # ------------------------------------------------------------------
    # First-occurrence emission order

    def _host_sel(self, part, lo: int, hi: int) -> np.ndarray:
        """The kernel's selection mask recomputed host-side over rows
        [lo, hi) of a part — used only to break first-occurrence ties
        within a single superblock."""
        g = part.batch.column(self.group_col)
        sel = g.validity[lo:hi].copy()
        if self.filter is not None:
            fcol, fop, lit = self.filter
            f = part.batch.column(fcol)
            fv = f.values[lo:hi]
            cmp = {
                "<": fv < lit,
                "<=": fv <= lit,
                ">": fv > lit,
                ">=": fv >= lit,
                "==": fv == lit,
                "!=": fv != lit,
            }[fop]
            sel &= cmp
            sel &= f.validity[lo:hi]
        return sel

    def _rank_ties(self, part, super_idx: int, codes_needed) -> dict:
        """Exact first selected row (global within the part) for each code
        whose first selected superblock is ``super_idx``."""
        from .ops.pallas_agg import ROWS_PER_SUPER

        lo = super_idx * ROWS_PER_SUPER
        hi = min(lo + ROWS_PER_SUPER, part.batch.num_rows)
        g = part.batch.column(self.group_col)
        gv = g.values[lo:hi]
        sel = self._host_sel(part, lo, hi)
        ranks = {}
        for k in codes_needed:
            idx = np.nonzero(sel & (gv == k))[0]
            ranks[k] = lo + int(idx[0])
        return ranks

    def _emission_order(
        self, parts, part_counts: np.ndarray, part_first: np.ndarray
    ) -> np.ndarray:
        """Group emission order = first occurrence of each code among the
        selected rows of the concatenated part stream (matching the generic
        engine's kernels.group_ids ordering).

        part_counts: [P, K] per-part selected-row counts per code.
        part_first: [P, K]; on TPU the first selected *superblock* per code
        (ties refined on host), elsewhere the exact first selected row.
        """
        order: list[int] = []
        seen: set[int] = set()
        for p_idx, part in enumerate(parts):
            pc = part_counts[p_idx]
            fresh = [k for k in np.nonzero(pc > 0)[0] if int(k) not in seen]
            if not fresh:
                continue
            if self.on_tpu:
                # part_first holds superblock indices; refine ties.
                by_super: dict[int, list[int]] = {}
                for k in fresh:
                    by_super.setdefault(int(part_first[p_idx][k]), []).append(
                        int(k)
                    )
                keyed: list[tuple[tuple[int, int], int]] = []
                for s, ks in by_super.items():
                    if len(ks) == 1:
                        keyed.append(((s, 0), ks[0]))
                    else:
                        ranks = self._rank_ties(part, s, ks)
                        for k in ks:
                            keyed.append(((s, ranks[k]), k))
                keyed.sort()
                ordered = [k for _key, k in keyed]
            else:
                ordered = sorted(
                    (int(k) for k in fresh),
                    key=lambda k: int(part_first[p_idx][k]),
                )
            for k in ordered:
                seen.add(k)
                order.append(k)
        return np.asarray(order, dtype=np.int64)

    # ------------------------------------------------------------------

    def execute(self) -> ColumnBatch:
        import jax.numpy as jnp

        from .ops.fused import (
            filter_group_scatter,
            first_selected_row,
            group_min_max_scatter,
        )
        from .ops.pallas_agg import (
            pallas_group_min_max,
            pallas_group_sum_count,
        )

        tx = (
            self.table.db.high_watermark()
            if self.table.db is not None
            else 2**63
        )
        from .table import SourceWithoutBlockAPI

        try:
            # Persisted blocks participate as cached device-resident parts
            # (uploaded once; store.go:123's cache/dedup) — the fast path
            # stays on after block rotation.
            parts = self.table.collect_parts(tx, include_sources=True)
        except SourceWithoutBlockAPI:
            raise NotCompilable("a data source lacks the block API")
        num_codes = max(len(self.dictionary), 1)
        num_digits, bias = self._check_parts(parts)

        sums = jnp.zeros((num_codes,), jnp.int64)
        counts = jnp.zeros((num_codes,), jnp.int64)
        mins = jnp.full((num_codes,), _INT32_MAX, jnp.int32)
        maxs = jnp.full((num_codes,), _INT32_MIN, jnp.int32)
        per_part_counts = []
        per_part_first = []
        for p in parts:
            codes, vals, sel = self._part_arrays(p, bias)
            if self.on_tpu:
                s, c, first = pallas_group_sum_count(
                    codes, vals, sel, num_codes, num_digits
                )
                if self.need_minmax:
                    mn, mx = pallas_group_min_max(codes, vals, sel, num_codes)
            else:
                flat_codes = codes.reshape(-1)
                flat_sel = sel.reshape(-1) > 0
                s, c = filter_group_scatter(
                    flat_codes, vals.reshape(-1), flat_sel, num_codes
                )
                first = first_selected_row(flat_codes, flat_sel, num_codes)
                if self.need_minmax:
                    mn, mx = group_min_max_scatter(
                        flat_codes, vals.reshape(-1), flat_sel, num_codes
                    )
            sums = sums + s
            counts = counts + c
            if self.need_minmax:
                mins = jnp.minimum(mins, mn)
                maxs = jnp.maximum(maxs, mx)
            per_part_counts.append(c)
            per_part_first.append(first)

        # ONE device->host fetch for the whole query: every [K]-sized result
        # (and the per-part order partials) concatenates into a single int64
        # blob sliced on the host. Each fetch is a full sync (a ~25 ms RTT
        # through the axon tunnel); four separate fetches would quadruple
        # serving latency.
        P = len(parts)
        blob_parts = [sums, counts]
        if self.need_minmax:
            blob_parts += [mins.astype(jnp.int64), maxs.astype(jnp.int64)]
        if P:
            blob_parts.append(jnp.stack(per_part_counts).ravel())
            blob_parts.append(
                jnp.stack(per_part_first).astype(jnp.int64).ravel()
            )
        blob = np.asarray(jnp.concatenate(blob_parts))
        off = 0
        sums_np = blob[off : off + num_codes]; off += num_codes
        counts_np = blob[off : off + num_codes]; off += num_codes
        if bias:
            # Exact reconstruction of the unbiased sums (see _check_parts).
            sums_np = sums_np + bias * counts_np
        mins_np = maxs_np = None
        if self.need_minmax:
            # Sentinels only survive for codes with no selected rows, which
            # are never emitted; the bias shift is order-preserving.
            mins_np = blob[off : off + num_codes] + bias; off += num_codes
            maxs_np = blob[off : off + num_codes] + bias; off += num_codes
        if P:
            part_counts = blob[off : off + P * num_codes].reshape(P, num_codes)
            off += P * num_codes
            part_first = blob[off : off + P * num_codes].reshape(P, num_codes)
            order_arr = self._emission_order(parts, part_counts, part_first)
        else:
            order_arr = np.asarray([], dtype=np.int64)
        if self.ordered and len(order_arr):
            # OrderedAggregate emits groups sorted by key string value
            # (ColumnBatch.sort_indices ranks dict codes via sort_ranks);
            # keys are unique so a stable re-sort of the emitted codes by
            # rank reproduces that order exactly.
            ranks = self.dictionary.sort_ranks()
            order_arr = order_arr[np.argsort(ranks[order_arr], kind="stable")]

        src_by_func = {
            E.AGG_SUM: sums_np,
            E.AGG_COUNT: counts_np,
            E.AGG_MIN: mins_np,
            E.AGG_MAX: maxs_np,
        }
        by_name = {
            spec.result_name: src_by_func[spec.func] for spec in self.aggs
        }
        return emit_output(
            self.group_col,
            self.dictionary,
            order_arr,
            [spec.result_name for spec in self.aggs],
            by_name,
            self.output_projection,
        )


def emit_output(
    group_col: str,
    dictionary,
    order_arr: np.ndarray,
    result_names: Sequence[str],
    by_name: dict,
    output_projection,
) -> ColumnBatch:
    """Materialize the output batch from dense [K] host partials + the group
    emission order — shared by the compiled and mesh executors so both emit
    byte-identical batches."""
    n = len(order_arr)

    def group_column():
        return Column(
            group_col,
            KIND_DICT,
            order_arr.astype(np.int32),
            np.ones(n, dtype=bool),
            dictionary,
        )

    def agg_column(out_name, src):
        return Column(
            out_name,
            KIND_INT64,
            src[order_arr] if n else src[:0],
            np.ones(n, dtype=bool),
        )

    if output_projection is None:
        cols = [group_column()]
        for name in result_names:
            cols.append(agg_column(name, by_name[name]))
        return ColumnBatch(cols, n)

    # Post-aggregation projection (the avg rewrite): evaluated on the
    # [K]-sized host partials; the generic engine's Projection dedups
    # output names first-wins, mirror that.
    cols = []
    seen: set[str] = set()
    for item in output_projection:
        if item[0] == "group":
            col = group_column()
        elif item[0] == "col":
            _, out_name, src_name = item
            col = agg_column(out_name, by_name[src_name])
        else:  # ("div", out, sum_name, count_name)
            _, out_name, s_name, c_name = item
            s = by_name[s_name][order_arr] if n else by_name[s_name][:0]
            c = by_name[c_name][order_arr] if n else by_name[c_name][:0]
            # Go-style truncation toward zero; division by zero emits
            # null — exactly ops/kernels.arith's integer "/" semantics.
            valid = c != 0
            safe_c = np.where(valid, c, 1)
            q = s // safe_c
            r = s - q * safe_c
            q = q + ((s < 0) != (safe_c < 0)) * (r != 0)
            col = Column(out_name, KIND_INT64, q, valid)
        if col.name in seen:
            continue
        seen.add(col.name)
        cols.append(col)
    return ColumnBatch(cols, n)


def compile_filter_aggregate(table, group_col, aggs, filter=None):
    """Try to build a compiled query; raises NotCompilable when the pattern
    doesn't hold (callers fall back to the generic engine)."""
    return CompiledFilterAggregate(table, group_col, aggs, filter)


# ---------------------------------------------------------------------------
# Planner lowering (engine integration)

_COMPARE_FILTER_OPS = ("<", "<=", ">", ">=", "==", "!=")


@dataclass
class FastPlanSpec:
    """A plan matched onto the fused filter+group-aggregate shape — shared
    by the single-chip compiled path (CompiledFilterAggregate) and the
    distributed mesh path (parallel/mesh_exec.MeshFilterAggregate)."""

    table: object
    group_col: str
    aggs: list  # (func, column, result_name)
    filter: Optional[tuple]  # (col, op, int literal) | None
    output_projection: Optional[list]
    ordered: bool


def lower_plan(plan, exec_options=None) -> CompiledFilterAggregate:
    """Pattern-match an *optimized* logical plan onto the compiled fast
    path. The engine calls this before building the generic operator DAG
    and falls back on ``NotCompilable``."""
    s = match_plan(plan, exec_options)
    return CompiledFilterAggregate(
        s.table,
        s.group_col,
        s.aggs,
        s.filter,
        s.output_projection,
        ordered=s.ordered,
    )


def match_plan(plan, exec_options=None) -> FastPlanSpec:
    """Match an *optimized* logical plan onto the fused fast shape.

    Matched shape: TableScan <- [Filter(col cmp int-literal)] <- Aggregation
    <- [Projection] where the optional projection is the avg rewrite's
    post-aggregation ``sum(x)/count(x) as avg(x)`` (builder.go:152-238) —
    evaluated here as a truncating division on the [K]-sized host partials.
    """
    node = plan
    proj_node = None
    if (
        node is not None
        and node.projection is not None
        and node.aggregation is None
    ):
        proj_node = node
        node = node.input
    if node is None or node.aggregation is None:
        raise NotCompilable("root is not an aggregation")
    agg_node = node
    agg = node.aggregation
    node = node.input
    filt = None
    while node is not None and node.filter is not None:
        if filt is not None:
            raise NotCompilable("multiple filter nodes")
        filt = node.filter.expr
        node = node.input
    if node is None or node.table_scan is None:
        raise NotCompilable("input is not a plain table scan")
    scan = node.table_scan
    table = scan.provider.get_table(scan.table_name)
    if table is None:
        raise NotCompilable(f"table not found: {scan.table_name}")

    if len(agg.group_exprs) != 1 or type(agg.group_exprs[0]) is not E.Column:
        raise NotCompilable("compiled path needs one concrete group column")
    group_col = agg.group_exprs[0].column_name

    aggs: list[tuple[str, str, str]] = []
    seen_names: set[str] = set()
    for a in agg.agg_exprs:
        result_name = None
        inner = a
        if isinstance(inner, E.AliasExpr):
            result_name = inner.alias_name
            inner = inner.expr
        if not isinstance(inner, E.AggregationFunction):
            raise NotCompilable("non-aggregation expression")
        if type(inner.expr) is not E.Column:
            raise NotCompilable("aggregation input is not a plain column")
        name = result_name or inner.name()
        if name in seen_names:
            continue  # the generic final stage dedups too (aggregate.go:973)
        seen_names.add(name)
        aggs.append((inner.func, inner.expr.column_name, name))

    filter_spec = None
    if filt is not None:
        if not (
            isinstance(filt, E.BinaryExpr)
            and type(filt.left) is E.Column
            and isinstance(filt.right, E.Literal)
            and filt.op in _COMPARE_FILTER_OPS
        ):
            raise NotCompilable("filter is not col <cmp> literal")
        lit = filt.right.value
        if not isinstance(lit, int) or isinstance(lit, bool):
            raise NotCompilable("filter literal is not an int")
        filter_spec = (filt.left.column_name, filt.op, lit)

    output_projection = None
    if proj_node is not None:
        agg_names = {name for _f, _c, name in aggs}
        output_projection = []
        for e in proj_node.projection.exprs:
            if type(e) is E.Column:
                if e.column_name != group_col:
                    raise NotCompilable("projection of a non-group column")
                output_projection.append(("group",))
            elif isinstance(e, E.AggregationFunction):
                name = e.name()
                if name not in agg_names:
                    raise NotCompilable(f"projection references {name}")
                output_projection.append(("col", name, name))
            elif isinstance(e, E.AliasExpr):
                inner = e.expr
                if isinstance(inner, E.AggregationFunction):
                    name = inner.name()
                    if name not in agg_names:
                        raise NotCompilable(f"projection references {name}")
                    output_projection.append(("col", e.alias_name, name))
                elif (
                    isinstance(inner, E.BinaryExpr)
                    and inner.op == E.OP_DIV
                    and isinstance(inner.left, E.AggregationFunction)
                    and isinstance(inner.right, E.AggregationFunction)
                ):
                    s_name, c_name = inner.left.name(), inner.right.name()
                    if s_name not in agg_names or c_name not in agg_names:
                        raise NotCompilable("division over unknown partials")
                    output_projection.append(
                        ("div", e.alias_name, s_name, c_name)
                    )
                else:
                    # e.g. ConvertExpr counts (float avg) — generic path.
                    raise NotCompilable("projection expr not compiled")
            else:
                raise NotCompilable("projection expr not compiled")

    # Mirror the generic planner's operator choice: when it would pick
    # OrderedAggregate (physical._should_plan_ordered with ordering_ok=True —
    # only scan/filter nodes sit below the aggregation in this pattern, and
    # neither resets stream ordering), emit groups in key order.
    ordered = False
    if exec_options is not None and exec_options.ordered_aggregations:
        from .query.physical import _should_plan_ordered

        ordered = _should_plan_ordered(exec_options, True, agg_node)

    return FastPlanSpec(
        table, group_col, aggs, filter_spec, output_projection, ordered
    )
