"""Jitted XLA kernels over padded column vectors.

These are the TPU-native replacements for the reference's per-row Go loops:

- predicate masks            <- query/physicalplan/binaryscalarexpr.go,
                                regexpfilter.go (bitmap building loops)
- projection arithmetic      <- query/physicalplan/project.go binaryExprProjection
- group aggregation          <- query/physicalplan/aggregate.go (hash map loop)
- distinct                   <- query/physicalplan/distinct.go (seen-set loop)
- sort/take                  <- pqarrow/arrowutils/sort.go

Design: every kernel takes padded static-shape arrays plus masks; row
selection is a boolean vector (the roaring-bitmap analogue, filter.go:255);
grouping is *exact* — a multi-key ``lax.sort`` followed by segment
reductions, so there are no hash collisions and group emission order is the
deterministic first-occurrence order of the input stream, matching the
reference's insertion-ordered hash table (aggregate.go:430 map + append-only
builders).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

_INT64_BIG = jnp.int64(2**62)


# ---------------------------------------------------------------------------
# Predicate masks


@functools.partial(jax.jit, static_argnames=("op",))
def compare_scalar_mask(values, validity, literal, op: str):
    """values <op> literal -> bool mask; null rows never match (reference:
    ArrayScalarCompute skips null slots, binaryscalarexpr.go:143-146)."""
    if op == "==":
        m = values == literal
    elif op == "!=":
        m = values != literal
    elif op == "<":
        m = values < literal
    elif op == "<=":
        m = values <= literal
    elif op == ">":
        m = values > literal
    elif op == ">=":
        m = values >= literal
    else:
        raise ValueError(f"unsupported compare op {op}")
    return m & validity


@jax.jit
def membership_mask(codes, validity, lut):
    """Dictionary predicate: lut[code] per row. ``lut`` is the host-evaluated
    bool vector over dictionary entries (equality / regexp / contains on the
    dictionary, the binaryscalarexpr.go:194 dictionary trick)."""
    n = lut.shape[0]
    safe = jnp.clip(codes, 0, max(n - 1, 0)).astype(jnp.int32)
    if n == 0:
        return jnp.zeros(codes.shape, dtype=jnp.bool_)
    return lut[safe] & validity


@jax.jit
def is_null_mask(validity, row_valid):
    return (~validity) & row_valid


# ---------------------------------------------------------------------------
# Projection arithmetic


@functools.partial(jax.jit, static_argnames=("op",))
def arith(lv, l_valid, rv, r_valid, op: str):
    """Elementwise binary arithmetic with null propagation. Integer division
    truncates toward zero like Go (jax.lax.div) and division by zero yields
    null (reference golden: logictest/testdata/exec/aggregate/math
    ``timestamp / value`` with value=0 -> null)."""
    valid = l_valid & r_valid
    if op == "+":
        out = lv + rv
    elif op == "-":
        out = lv - rv
    elif op == "*":
        out = lv * rv
    elif op == "/":
        if jnp.issubdtype(lv.dtype, jnp.integer):
            zero = rv == 0
            valid = valid & ~zero
            out = jax.lax.div(lv, jnp.where(zero, jnp.ones_like(rv), rv))
        else:
            zero = rv == 0
            valid = valid & ~zero
            out = lv / jnp.where(zero, jnp.ones_like(rv), rv)
    else:
        raise ValueError(f"unsupported arith op {op}")
    return out, valid


@functools.partial(jax.jit, static_argnames=("op",))
def compare_columns(lv, l_valid, rv, r_valid, op: str):
    """Column-vs-column comparison producing a bool column (projection of a
    comparison, e.g. ``select distinct(..., value > 0)``)."""
    valid = l_valid & r_valid
    if op == "==":
        out = lv == rv
    elif op == "!=":
        out = lv != rv
    elif op == "<":
        out = lv < rv
    elif op == "<=":
        out = lv <= rv
    elif op == ">":
        out = lv > rv
    elif op == ">=":
        out = lv >= rv
    else:
        raise ValueError(f"unsupported compare op {op}")
    return out, valid


# ---------------------------------------------------------------------------
# Exact group-by aggregation

AGG_SUM = "sum"
AGG_COUNT = "count"
AGG_MIN = "min"
AGG_MAX = "max"
AGG_UNIQUE = "unique"
AGG_AND = "and"


def _as_sort_key(vals) -> jax.Array:
    """Map a key column to an int64 equality-preserving representation."""
    dt = vals.dtype
    if dt == jnp.bool_:
        return vals.astype(jnp.int64)
    if jnp.issubdtype(dt, jnp.floating):
        return jax.lax.bitcast_convert_type(
            vals.astype(jnp.float64), jnp.int64
        )
    if dt == jnp.uint64:
        return jax.lax.bitcast_convert_type(vals, jnp.int64)
    return vals.astype(jnp.int64)


@jax.jit
def group_ids(key_vals, key_valid, sel):
    """Exact grouping pass, shared by aggregation and distinct.

    Sorts selected rows to the front grouped by the key tuple (stable by
    original row index), derives segment boundaries and first-occurrence
    ordering. Compiled once per (number of keys, padded size) — the
    per-aggregation reductions are separate kernels (``segment_agg``) so new
    query shapes reuse this compilation.

    Returns (num_groups, perm, sel_sorted, seg, order, first_row_ordered):
      - perm[i]: original row index of sorted position i
      - seg[i]: segment (group) id of sorted position i (key-sorted order)
      - order[g_out] = key-order group id emitted at output position g_out
        (output positions are first-occurrence order)
      - first_row_ordered[g_out]: first original row of that group (== n for
        positions beyond num_groups)
    """
    n = sel.shape[0]
    rowidx = jnp.arange(n, dtype=jnp.int32)

    operands = [(~sel).astype(jnp.int8)]
    for v, va in zip(key_vals, key_valid):
        r = jnp.where(va & sel, _as_sort_key(v), jnp.int64(0))
        knull = jnp.where(va & sel, jnp.int8(1), jnp.int8(0))
        operands.extend([knull, r])
    operands.append(rowidx)
    sorted_ops = jax.lax.sort(tuple(operands), num_keys=len(operands))
    perm = sorted_ops[-1]
    sel_sorted = sorted_ops[0] == 0

    def diffs(arr):
        return jnp.concatenate(
            [jnp.ones((1,), dtype=jnp.bool_), arr[1:] != arr[:-1]]
        )

    if len(key_vals) > 0:
        changed = jnp.zeros(n, dtype=jnp.bool_)
        for arr in sorted_ops[1:-1]:
            changed = changed | diffs(arr)
    else:
        changed = jnp.concatenate(
            [jnp.ones((1,), dtype=jnp.bool_), jnp.zeros((n - 1,), dtype=jnp.bool_)]
        )
    boundary = changed & sel_sorted
    num_groups = boundary.sum()
    seg = jnp.maximum(jnp.cumsum(boundary.astype(jnp.int32)) - 1, 0)

    # First original row per group; rows within a segment are in ascending
    # original order thanks to the rowidx sort key.
    first_row = jax.ops.segment_min(
        jnp.where(sel_sorted, perm, jnp.int32(n)), seg, num_segments=n
    )
    order = jnp.argsort(first_row, stable=True)
    first_row_o = jnp.take(first_row, order)
    return num_groups, perm, sel_sorted, seg, order, first_row_o


def ident_like(v):
    """Min-reduce identity that can NEVER clamp a real value: group_ids
    routes unselected/padding rows into the LAST segment, so segment_agg's
    identities compete inside real groups — a +-2^62 identity silently
    clamped min/max results whose values (or float ordering keys: any
    |x| >= 2.0 maps past 2^62) exceeded it (round-5 parity probe). The
    int64 extremes are exact even on collision: min's identity INT64_MAX
    only ties a true INT64_MAX value."""
    if jnp.issubdtype(v.dtype, jnp.floating):
        return jnp.array(jnp.inf, dtype=v.dtype)
    return jnp.int64(2**63 - 1).astype(v.dtype)


@functools.partial(jax.jit, static_argnames=("op",))
def segment_agg(vals, valid, perm, sel_sorted, seg, order, op: str):
    """One aggregation over the segments produced by ``group_ids``. Returns
    (out[N], valid[N]) in first-occurrence output order. Compiled once per
    (op, dtype, padded size)."""
    n = sel_sorted.shape[0]
    v_s = jnp.take(vals, perm)
    va_s = jnp.take(valid, perm)
    if op == AGG_SUM:
        # Null slots hold zero, matching the reference's raw-buffer sum
        # (aggregate.go:763 math.Int64.Sum includes null slots).
        out = jax.ops.segment_sum(
            jnp.where(sel_sorted, v_s, jnp.zeros_like(v_s)), seg, num_segments=n
        )
        valid_out = jnp.ones(n, dtype=jnp.bool_)
    elif op == AGG_COUNT:
        # Counts all rows in the group including nulls (aggregate.go:934).
        out = jax.ops.segment_sum(
            jnp.where(sel_sorted, jnp.int64(1), jnp.int64(0)), seg, num_segments=n
        )
        valid_out = jnp.ones(n, dtype=jnp.bool_)
    elif op == AGG_MIN:
        ident = ident_like(v_s)
        out = jax.ops.segment_min(
            jnp.where(sel_sorted, v_s, ident), seg, num_segments=n
        )
        valid_out = jnp.ones(n, dtype=jnp.bool_)
    elif op == AGG_MAX:
        # exact max identity: -inf / INT64_MIN (a negated min-identity
        # -(2^63-1) would clamp an all-INT64_MIN group by one)
        if jnp.issubdtype(v_s.dtype, jnp.floating):
            ident = jnp.array(-jnp.inf, dtype=v_s.dtype)
        else:
            ident = jnp.int64(-(2**63)).astype(v_s.dtype)
        out = jax.ops.segment_max(
            jnp.where(sel_sorted, v_s, ident), seg, num_segments=n
        )
        valid_out = jnp.ones(n, dtype=jnp.bool_)
    elif op == AGG_UNIQUE:
        # Value if the group holds exactly one distinct non-null value and no
        # nulls; else null (aggregate.go:712 uniqueInt64arrays).
        r = _as_sort_key(v_s)
        # int64-extreme identities (exact on collision; +-2^62 could clamp
        # full-range sort keys — see ident_like)
        mn = jax.ops.segment_min(
            jnp.where(sel_sorted, r, jnp.int64(2**63 - 1)),
            seg,
            num_segments=n,
        )
        mx = jax.ops.segment_max(
            jnp.where(sel_sorted, r, jnp.int64(-(2**63))),
            seg,
            num_segments=n,
        )
        has_null = (
            jax.ops.segment_max(
                jnp.where(sel_sorted & ~va_s, jnp.int32(1), jnp.int32(0)),
                seg,
                num_segments=n,
            )
            > 0
        )
        out = jax.ops.segment_min(
            jnp.where(sel_sorted, v_s, jnp.zeros_like(v_s) + ident_like(v_s)),
            seg,
            num_segments=n,
        )
        valid_out = (mn == mx) & ~has_null
    elif op == AGG_AND:
        out = (
            jax.ops.segment_min(
                jnp.where(sel_sorted & va_s, v_s.astype(jnp.int8), jnp.int8(1)),
                seg,
                num_segments=n,
            )
            > 0
        )
        valid_out = jnp.ones(n, dtype=jnp.bool_)
    else:
        raise ValueError(f"unsupported aggregation {op}")
    return jnp.take(out, order), jnp.take(valid_out, order)


def group_aggregate(key_vals, key_valid, agg_vals, agg_valid, sel, agg_ops):
    """Exact grouped aggregation: ``group_ids`` + per-op ``segment_agg``.

    Returns (num_groups, first_row, group_key_vals, group_key_valid,
    agg_out_vals, agg_out_valid); arrays have length N, valid entries are the
    first num_groups, ordered by first occurrence in the stream."""
    n = sel.shape[0]
    num_groups, perm, sel_sorted, seg, order, first_row_o = group_ids(
        tuple(key_vals), tuple(key_valid), sel
    )
    fr = jnp.minimum(first_row_o, n - 1)
    group_key_vals = tuple(jnp.take(v, fr) for v in key_vals)
    group_key_valid = tuple(jnp.take(va, fr) & (first_row_o < n) for va in key_valid)
    outs = []
    valids = []
    for (v, va), op in zip(zip(agg_vals, agg_valid), agg_ops):
        o, vo = segment_agg(v, va, perm, sel_sorted, seg, order, op)
        outs.append(o)
        valids.append(vo & (first_row_o < n))
    return (
        num_groups,
        first_row_o,
        group_key_vals,
        group_key_valid,
        tuple(outs),
        tuple(valids),
    )


@jax.jit
def ordered_group_ids(key_vals, key_valid, sel):
    """Grouping pass for already-sorted input (reference:
    pqarrow/arrowutils/groupranges.go GetGroupsAndOrderedSetRanges +
    OrderedAggregate): no sort — boundaries are computed positionally, so
    this is a single streaming pass. Selected rows must form a prefix.

    Returns (num_groups, seg[N], first_row[N]) with groups in stream order.
    """
    n = sel.shape[0]
    rowidx = jnp.arange(n, dtype=jnp.int32)

    def diffs(arr):
        return jnp.concatenate(
            [jnp.ones((1,), dtype=jnp.bool_), arr[1:] != arr[:-1]]
        )

    changed = jnp.zeros(n, dtype=jnp.bool_)
    any_key = False
    for v, va in zip(key_vals, key_valid):
        r = jnp.where(va & sel, _as_sort_key(v), jnp.int64(0))
        k = jnp.where(va & sel, jnp.int8(1), jnp.int8(0))
        changed = changed | diffs(r) | diffs(k)
        any_key = True
    if not any_key:
        changed = jnp.concatenate(
            [jnp.ones((1,), dtype=jnp.bool_), jnp.zeros((n - 1,), dtype=jnp.bool_)]
        )
    boundary = changed & sel
    num_groups = boundary.sum()
    seg = jnp.maximum(jnp.cumsum(boundary.astype(jnp.int32)) - 1, 0)
    first_row = jax.ops.segment_min(
        jnp.where(sel, rowidx, jnp.int32(n)), seg, num_segments=n
    )
    return num_groups, seg, first_row


def distinct_rows(key_vals, key_valid, sel):
    """First-occurrence distinct row indices over the key tuple (reference:
    query/physicalplan/distinct.go seen-set). Returns (num_distinct,
    row_indices[N])."""
    num_groups, _perm, _ss, _seg, _order, first_row_o = group_ids(
        tuple(key_vals), tuple(key_valid), sel
    )
    return num_groups, first_row_o


# ---------------------------------------------------------------------------
# Sort / take (reference: pqarrow/arrowutils/sort.go SortRecord + Take)


@functools.partial(jax.jit, static_argnames=("descending", "nulls_first"))
def sort_indices_single(vals, valid, descending: bool, nulls_first: bool):
    r = _as_sort_key(vals)
    if descending:
        r = -r
    nullkey = -_INT64_BIG if nulls_first else _INT64_BIG
    r = jnp.where(valid, r, nullkey)
    n = vals.shape[0]
    rowidx = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort((r, rowidx), num_keys=2)
    return perm


@jax.jit
def take(vals, indices):
    return jnp.take(vals, indices)


# ---------------------------------------------------------------------------
# Dense-code fast path: group keys are small dictionary-code spaces combined
# into one dense int32 code; aggregation is a single segment reduction (or a
# one-hot MXU matmul). This is the bench hot path (SURVEY.md §7 design
# stance: hash aggregate as dense per-chip table + two-phase psum).


@functools.partial(jax.jit, static_argnames=("num_codes", "ops"))
def sorted_group_reduce(codes, sel, rows, vals, num_codes: int, ops: tuple):
    """Dense [num_codes] group reduction via sort + prefix sums — the
    large-K path. XLA lowers unsorted segment reductions to scatter, which
    serializes on TPU; past a few thousand codes one sort of the rows plus
    gather-based segment boundaries (searchsorted) beats it by orders of
    magnitude (the classic sort-based GPU/TPU group-by; plays the role of
    aggregate.go's unbounded group map).

    codes [N] int32, sel [N] bool, rows [N] int64 stream positions,
    vals: tuple of [N] int64 value vectors, ops: per-val AGG_SUM/MIN/MAX.

    Returns (counts [K] i64, first [K] i64 with 2^62 sentinel, outs tuple):
    - sums are differences of int64 prefix sums — exact under int64
      wrap-around (differences of wrapped prefixes equal the true segment
      sum mod 2^64, matching the generic engine's wrapping adds);
    - min/max ride one extra sort per column keyed (code, value): the
      segment's first/last element is its extreme. Sentinels match
      ident_like (+/-2^62).
    """
    n = codes.shape[0]
    key = jnp.where(sel, codes, jnp.int32(num_codes))
    minmax_idx = [i for i, op in enumerate(ops) if op in (AGG_MIN, AGG_MAX)]
    sum_idx = [i for i, op in enumerate(ops) if op == AGG_SUM]
    operands = (key, rows) + tuple(vals[i] for i in sum_idx)
    sorted_ = jax.lax.sort(operands, num_keys=2)
    key_s, rows_s = sorted_[0], sorted_[1]
    ks = jnp.arange(num_codes, dtype=key.dtype)
    start = jnp.searchsorted(key_s, ks, side="left")
    end = jnp.searchsorted(key_s, ks, side="right")
    counts = (end - start).astype(jnp.int64)
    first = jnp.where(
        counts > 0,
        jnp.take(rows_s, jnp.minimum(start, n - 1)),
        _INT64_BIG,
    )
    outs: list = [None] * len(ops)
    for i, si in enumerate(sum_idx):
        v_s = sorted_[2 + i]
        ps = jnp.cumsum(jnp.where(key_s < num_codes, v_s, jnp.int64(0)))
        ps0 = jnp.concatenate([jnp.zeros((1,), ps.dtype), ps])
        outs[si] = jnp.take(ps0, end) - jnp.take(ps0, start)
    for i in minmax_idx:
        k2, v2 = jax.lax.sort((key, vals[i]), num_keys=2)
        if ops[i] == AGG_MIN:
            outs[i] = jnp.where(
                counts > 0,
                jnp.take(v2, jnp.minimum(start, n - 1)),
                _INT64_BIG,
            )
        else:
            outs[i] = jnp.where(
                counts > 0,
                jnp.take(v2, jnp.maximum(end - 1, 0)),
                -_INT64_BIG,
            )
    return counts, first, tuple(outs)


@functools.partial(jax.jit, static_argnames=("num_codes", "op"))
def dense_group_reduce(codes, vals, sel, num_codes: int, op: str):
    """Per-code reduction into a dense [num_codes] table."""
    c = jnp.where(sel, codes, jnp.int32(num_codes))
    if op == AGG_SUM:
        return jax.ops.segment_sum(
            jnp.where(sel, vals, jnp.zeros_like(vals)), c, num_segments=num_codes + 1
        )[:num_codes]
    if op == AGG_COUNT:
        return jax.ops.segment_sum(
            jnp.where(sel, jnp.int64(1), jnp.int64(0)), c, num_segments=num_codes + 1
        )[:num_codes]
    if op == AGG_MIN:
        ident = ident_like(vals)
        return jax.ops.segment_min(
            jnp.where(sel, vals, ident), c, num_segments=num_codes + 1
        )[:num_codes]
    if op == AGG_MAX:
        ident = -ident_like(vals)
        return jax.ops.segment_max(
            jnp.where(sel, vals, ident), c, num_segments=num_codes + 1
        )[:num_codes]
    raise ValueError(op)


# ---------------------------------------------------------------------------
# Hash-join expansion (north-star component, SURVEY.md §2.8 — the reference
# has no join operator; the single-chip analogue of the distributed CSR join
# in parallel/join.py, sharing its math so local and mesh results agree).


@functools.partial(
    jax.jit, static_argnames=("num_codes", "capacity", "left_outer")
)
def join_expand(
    lcodes,
    lkey_valid,
    llive,
    rcodes,
    rkey_valid,
    num_codes: int,
    capacity: int,
    left_outer: bool,
):
    """Expand equi-join matches on shared int key codes.

    Build side (right) rows bucket by code via stable argsort (CSR); each
    probe (left) row's matches expand through an exclusive cumsum of per-row
    output counts and a searchsorted over the output index space — static
    shapes throughout, the same formulation as the distributed kernel
    (parallel/join.py distributed_hash_join_multi). Output slots are ordered
    (left row asc, right row asc): stable sort keeps equal codes in original
    right-row order, making the emission order canonical on any device
    count.

    Returns (total, li, rrow, live, matched): ``li``/``rrow`` index the
    probe/build rows per output slot; ``live`` marks slots < total;
    ``matched`` marks slots with a real build match (False only for
    left_outer's null-extended rows).
    """
    n_l = lcodes.shape[0]
    n_r = rcodes.shape[0]
    safe_r = jnp.where(rkey_valid, rcodes.astype(jnp.int32), jnp.int32(num_codes))
    # Stable-argsort order via an unstable sort of a unique composite key
    # (code * n_r + row): TPU lowers a single-key sort in seconds where the
    # stable multi-operand argsort comparator takes minutes to compile
    # through the tunnel.
    if (num_codes + 1) * n_r < 2**31:
        comp = safe_r * jnp.int32(n_r) + jnp.arange(n_r, dtype=jnp.int32)
        perm = jnp.sort(comp) % jnp.int32(n_r)
    else:
        comp = safe_r.astype(jnp.int64) * n_r + jnp.arange(n_r, dtype=jnp.int64)
        perm = (jnp.sort(comp) % n_r).astype(jnp.int32)
    counts = jax.ops.segment_sum(
        jnp.where(rkey_valid, jnp.int32(1), jnp.int32(0)),
        safe_r,
        num_segments=num_codes + 1,
    )[:num_codes]
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)[:-1]]
    )
    lc = jnp.clip(lcodes.astype(jnp.int32), 0, num_codes - 1)
    mc = jnp.where(lkey_valid & llive, counts[lc], 0)
    if left_outer:
        out_counts = jnp.where(llive, jnp.maximum(mc, 1), 0)
    else:
        out_counts = mc
    off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int64), jnp.cumsum(out_counts).astype(jnp.int64)]
    )
    total = off[-1]
    out_idx = jnp.arange(capacity, dtype=jnp.int64)
    li = jnp.clip(
        jnp.searchsorted(off, out_idx, side="right") - 1, 0, n_l - 1
    ).astype(jnp.int32)
    rank = (out_idx - off[li]).astype(jnp.int32)
    code = jnp.clip(lcodes[li].astype(jnp.int32), 0, num_codes - 1)
    has = mc[li] > 0
    rpos = jnp.clip(starts[code] + rank, 0, n_r - 1)
    rrow = perm[rpos].astype(jnp.int32)
    live = out_idx < total
    matched = live & has
    return total, li, rrow, live, matched
