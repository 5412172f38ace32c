"""Compiled serving queries: filter + group-aggregate lowered onto the
fused device kernels over a table's device-cached parts.

This is the production serving path for the engine's hot query shape (the
reference's Merge/Range queries, bench_test.go:299): the generic operator
pipeline (query/physical.py) is exact and fully general; this layer applies
when the planner can PROVE the fast pattern:

- group keys are table-global dictionary codes with a combined code space
  <= 128 (one accumulator tile),
- aggregations are sum/count of a non-negative bounded int column,
- the filter is a single comparison on a numeric column (fused into the
  kernel) or absent.

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
        aggs: Sequence[tuple[str, str]],  # (func, column)
        filter: Optional[tuple[str, str, int]] = None,  # (col, op, literal)
    ):
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
        if len(self.dictionary) > 128:
            raise NotCompilable("code space > 128 (tile limit this round)")

        self.aggs = []
        self.value_col: Optional[str] = None
        for func, col in aggs:
            if func not in (E.AGG_SUM, E.AGG_COUNT):
                raise NotCompilable(f"agg {func} not in compiled set")
            if func == E.AGG_SUM:
                if self.value_col is not None and self.value_col != col:
                    raise NotCompilable("one summed column per compiled query")
                self.value_col = col
            self.aggs.append(
                _AggSpec(func, col, f"{func}({col})")
            )
        if self.filter is not None:
            fcol, fop, _lit = self.filter
            if fop not in ("<", "<=", ">", ">=", "==", "!="):
                raise NotCompilable(f"filter op {fop} not comparable")

    # ------------------------------------------------------------------

    def _part_arrays(self, part):
        """Device arrays for one part in kernel layout, via the part's
        cached device batch. Rows pad to the kernel's superblock."""
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
            vals = pad2d(v.data.astype(jnp.int32))
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

    def execute(self) -> ColumnBatch:
        import jax.numpy as jnp

        from .ops.fused import filter_group_scatter
        from .ops.pallas_agg import pallas_group_sum_count

        tx = (
            self.table.db.high_watermark()
            if self.table.db is not None
            else 2**63
        )
        parts = self.table.collect_parts(tx)
        num_codes = max(len(self.dictionary), 1)

        # value bound -> digit count (host check over part maxima)
        num_digits = 2
        if self.value_col is not None:
            vmax = 0
            for p in parts:
                c = p.batch.column(self.value_col)
                if c is None:
                    continue
                if c.kind != KIND_INT64:
                    raise NotCompilable("compiled sums are int columns")
                if len(c.values) and c.validity.any():
                    lo = int(c.values[c.validity].min())
                    if lo < 0:
                        raise NotCompilable("negative values (this round)")
                    vmax = max(vmax, int(c.values[c.validity].max()))
            num_digits = _digits_for(max(vmax, 1))

        sums = jnp.zeros((num_codes,), jnp.int64)
        counts = jnp.zeros((num_codes,), jnp.int64)
        for p in parts:
            codes, vals, sel = self._part_arrays(p)
            if self.on_tpu:
                s, c = pallas_group_sum_count(
                    codes, vals, sel, num_codes, num_digits
                )
            else:
                s, c = filter_group_scatter(
                    codes.reshape(-1),
                    vals.reshape(-1),
                    sel.reshape(-1) > 0,
                    num_codes,
                )
            sums = sums + s
            counts = counts + c

        sums_np = np.asarray(sums)
        counts_np = np.asarray(counts)
        present = counts_np > 0

        # Emission order: first occurrence of each code across the part
        # stream (host-side pass over the host copies of the code column).
        order: list[int] = []
        seen: set[int] = set()
        for p in parts:
            g = p.batch.column(self.group_col)
            if g is None:
                continue
            codes_np = g.values[g.validity]
            _u, idx = np.unique(codes_np, return_index=True)
            for i in np.sort(idx):
                code = int(codes_np[i])
                if code not in seen and present[code]:
                    seen.add(code)
                    order.append(code)
        order_arr = np.asarray(order, dtype=np.int64)

        n = len(order_arr)
        cols = [
            Column(
                self.group_col,
                KIND_DICT,
                order_arr.astype(np.int32),
                np.ones(n, dtype=bool),
                self.dictionary,
            )
        ]
        for spec in self.aggs:
            src = sums_np if spec.func == E.AGG_SUM else counts_np
            cols.append(
                Column(
                    spec.result_name,
                    KIND_INT64,
                    src[order_arr] if n else src[:0],
                    np.ones(n, dtype=bool),
                )
            )
        return ColumnBatch(cols, n)


def compile_filter_aggregate(table, group_col, aggs, filter=None):
    """Try to build a compiled query; raises NotCompilable when the pattern
    doesn't hold (callers fall back to the generic engine)."""
    return CompiledFilterAggregate(table, group_col, aggs, filter)
