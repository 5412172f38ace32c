"""Fused filter + hash-aggregate fast path — the bench hot loop.

The reference's hot query loop is a per-row Go map insert
(query/physicalplan/aggregate.go:400-490). The TPU-native design turns the
dense dictionary-code group space into **one-hot MXU matmuls**:

    sums[k] = sum_n values[n] * sel[n] * (codes[n] == k)

i.e. a contraction of the value vector with an on-the-fly one-hot matrix —
XLA fuses the one-hot generation into the matmul operand tiles, so the data
is read once from HBM and all arithmetic rides the MXU's int8 path
(s8 x s8 -> s32 accumulation is native).

Exactness: int64 values are decomposed into base-128 digits (int8 "nibbles"
in [0,127]); each digit matmul accumulates in int32 — exact as long as
per-chunk row count * 127 < 2^31, enforced by chunking — and the digit
partials recombine into int64 on the [K]-sized output, where 64-bit
emulation is cheap. Counts are a ones-vector matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _digit_count(max_abs: int) -> int:
    d = 1
    limit = 127
    while limit < max_abs:
        limit = limit * 128 + 127
        d += 1
    return d


@functools.partial(
    jax.jit, static_argnames=("num_codes", "num_digits", "chunk_rows")
)
def filter_group_sum_count(
    codes,  # [N] int32 group codes
    values,  # [N] int32 (non-negative; digit-decomposed internally)
    sel,  # [N] bool selected rows
    num_codes: int,
    num_digits: int = 5,
    chunk_rows: int = 1 << 16,
):
    """Returns (sums[num_codes] int64, counts[num_codes] int64), exact.

    N must be a multiple of chunk_rows. chunk_rows * 127 must stay < 2^31
    (int32 accumulator headroom): 2^16 rows * 127 = 2^23 — ample.
    """
    n = codes.shape[0]
    c = n // chunk_rows
    codes2 = codes.reshape(c, chunk_rows)
    values2 = values.reshape(c, chunk_rows)
    sel2 = sel.reshape(c, chunk_rows)

    # one-hot [c, chunk, K] int8, generated on the fly inside the matmul
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, num_codes), 2)
    onehot = (codes2[:, :, None] == iota_k) & sel2[:, :, None]
    onehot8 = onehot.astype(jnp.int8)

    # counts: ones contraction
    ones8 = sel2.astype(jnp.int8)
    counts32 = jax.lax.dot_general(
        ones8,
        onehot8,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [c, K]
    counts = counts32.astype(jnp.int64).sum(axis=0)

    # value digits: base-128 decomposition, one int8 matmul per digit
    sums = jnp.zeros((num_codes,), dtype=jnp.int64)
    v = values2
    for d in range(num_digits):
        digit = (v % 128).astype(jnp.int8)
        v = v // 128
        part32 = jax.lax.dot_general(
            digit,
            onehot8,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # [c, K]
        sums = sums + (part32.astype(jnp.int64).sum(axis=0) << (7 * d))
    return sums, counts


@functools.partial(jax.jit, static_argnames=("num_codes",))
def first_selected_row(codes, sel, num_codes: int):
    """Exact first selected row index per code (n when absent) — the
    first-occurrence group-emission order on the non-TPU backends, where
    XLA scatter reductions are cheap."""
    n = codes.shape[0]
    rowidx = jnp.arange(n, dtype=jnp.int32)
    safe = jnp.where(sel, codes, num_codes)
    return jax.ops.segment_min(
        jnp.where(sel, rowidx, jnp.int32(n)), safe, num_segments=num_codes + 1
    )[:num_codes]


@functools.partial(jax.jit, static_argnames=("num_codes",))
def group_min_max_scatter(codes, values, sel, num_codes: int):
    """Grouped min/max over selected rows via XLA segment reductions (the
    non-TPU twin of pallas_group_min_max; same int32 sentinel contract)."""
    big = jnp.int32(2**31 - 1)
    small = jnp.int32(-(2**31))
    safe = jnp.where(sel, codes, num_codes)
    mins = jax.ops.segment_min(
        jnp.where(sel, values, big), safe, num_segments=num_codes + 1
    )[:num_codes]
    maxs = jax.ops.segment_max(
        jnp.where(sel, values, small), safe, num_segments=num_codes + 1
    )[:num_codes]
    return mins, maxs


@functools.partial(jax.jit, static_argnames=("num_codes",))
def filter_group_scatter(codes, values, sel, num_codes: int):
    """Scatter-add formulation (XLA scatter) — the comparison point."""
    safe = jnp.where(sel, codes, num_codes)
    sums = jnp.zeros(num_codes + 1, dtype=jnp.int64).at[safe].add(
        jnp.where(sel, values.astype(jnp.int64), 0)
    )
    counts = jnp.zeros(num_codes + 1, dtype=jnp.int64).at[safe].add(
        jnp.where(sel, 1, 0)
    )
    return sums[:num_codes], counts[:num_codes]
