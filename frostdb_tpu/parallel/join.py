"""Distributed hash join (north-star extension; the reference has no join
operator at all — verified by grep over query/, SURVEY.md intro).

Strategy: both sides hash-partitioned on the join key over the same mesh
(PartitionedTable.from_batch(hash_key=...)), so equal keys are co-located
and the join is shard-local — the shuffle cost is paid once at load, like
the reference pays hashing cost at insert (dynparquet/hashed.go). The local
join builds a dense code-indexed table (unique build keys: primary-key
join) and probes with a gather; ICI is only used when sides are *not*
co-partitioned, in which case the build side is all-gathered when small
(broadcast join) — the classic two regimes.

Skew: hash partitioning of *keys* (not rows) bounds per-shard build size;
heavy probe keys are naturally spread only in the broadcast regime — the
salting repartition for skewed co-partitioned probes is future work, noted
in SURVEY.md §7 hard parts.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import PartitionedTable


def distributed_hash_join(
    left: PartitionedTable,
    right: PartitionedTable,
    key: str,
    num_codes: int,
    right_value_cols: Sequence[str],
    broadcast_right: bool = False,
):
    """Join left rows with unique-key right rows on dict-coded ``key``.

    Returns a jitted zero-arg callable producing, for each right value
    column, an array aligned with the left table's (sharded) rows:
    (values, matched_mask). Unmatched or invalid left rows get mask False.
    """
    mesh = left.mesh
    axis = left.axis
    lk = left.column(key)
    rk = right.column(key)
    rvals = [right.column(c) for c in right_value_cols]

    def step(lcodes, lvalid, rcodes, rvalid, *rvs):
        # Build: dense table code -> row payload (unique keys).
        if broadcast_right:
            rcodes = jax.lax.all_gather(rcodes, axis, tiled=True)
            rvalid = jax.lax.all_gather(rvalid, axis, tiled=True)
            rvs = tuple(
                (
                    jax.lax.all_gather(v, axis, tiled=True),
                    jax.lax.all_gather(va, axis, tiled=True),
                )
                for v, va in zip(rvs[0::2], rvs[1::2])
            )
        else:
            rvs = tuple((v, va) for v, va in zip(rvs[0::2], rvs[1::2]))

        safe = jnp.where(rvalid, rcodes.astype(jnp.int32), num_codes)
        present = (
            jax.ops.segment_max(
                jnp.where(rvalid, jnp.int32(1), jnp.int32(0)),
                safe,
                num_segments=num_codes + 1,
            )[:num_codes]
            > 0
        )
        # row index of the (unique) right row per code
        n_r = rcodes.shape[0]
        ridx = jax.ops.segment_min(
            jnp.where(rvalid, jnp.arange(n_r, dtype=jnp.int32), jnp.int32(n_r)),
            safe,
            num_segments=num_codes + 1,
        )[:num_codes]
        ridx = jnp.minimum(ridx, n_r - 1)

        lc = jnp.clip(lcodes.astype(jnp.int32), 0, num_codes - 1)
        matched = lvalid & present[lc]
        outs = []
        for v, va in rvs:
            probe_rows = ridx[lc]
            outs.append(v[probe_rows])
            matched = matched & va[probe_rows]
        return (matched,) + tuple(outs)

    args = [lk.data, lk.validity, rk.data, rk.validity]
    for c in rvals:
        args += [c.data, c.validity]
    in_specs = tuple(P(axis) for _ in args)
    out_specs = tuple(P(axis) for _ in range(1 + len(rvals)))
    f = jax.shard_map(step, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    jf = jax.jit(f)

    def run():
        res = jf(*args)
        return res[0], res[1:]

    return run


def distributed_hash_join_multi(
    left: PartitionedTable,
    right: PartitionedTable,
    key: str,
    num_codes: int,
    right_value_cols: Sequence[str],
    out_capacity: int,
    mode: str = "inner",
):
    """Duplicate-key distributed join on dict-coded ``key`` (the general
    case distributed_hash_join's unique-build-key fast path excludes).

    TPU-native formulation on static shapes: per shard, the build side
    sorts by key code into CSR buckets (argsort + segment counts + cumsum);
    each probe row's matches expand via an exclusive cumsum of per-row
    match counts and a searchsorted over the output index space — all
    gathers and scans, no data-dependent shapes. The data-dependent OUTPUT
    size is handled the same way as the shuffle (shuffle.py): a static
    per-shard ``out_capacity`` with exact overflow detection; callers use
    ``distributed_join_auto`` to escalate capacity geometrically.

    Modes:
      inner       one output row per (probe row, matching build row)
      left_outer  unmatched/invalid-key probe rows emit one row with
                  right_valid False
      semi/anti   no expansion: a [rows]-aligned bool mask per probe row

    Returns a zero-arg callable producing per-shard-concatenated arrays:
      inner/left_outer: (totals[S], left_row, right_valid, *right_vals)
        with slots >= totals[s] inside shard s undefined;
      semi/anti: mask aligned with the left table's rows.
    """
    if mode not in ("inner", "left_outer", "semi", "anti"):
        raise ValueError(f"unknown join mode {mode}")
    mesh = left.mesh
    axis = left.axis
    lk = left.column(key)
    rk = right.column(key)
    rvals = [right.column(c) for c in right_value_cols]

    def step(lcodes, lvalid, rcodes, rvalid, *rvs):
        rv_pairs = tuple((v, va) for v, va in zip(rvs[0::2], rvs[1::2]))
        n_r = rcodes.shape[0]
        n_l = lcodes.shape[0]
        safe_r = jnp.where(rvalid, rcodes.astype(jnp.int32), num_codes)
        # CSR buckets: build rows sorted by code; starts via cumsum.
        perm = jnp.argsort(safe_r)  # invalid (num_codes) sort last
        counts = jax.ops.segment_sum(
            jnp.where(rvalid, jnp.int32(1), jnp.int32(0)),
            safe_r,
            num_segments=num_codes + 1,
        )[:num_codes]
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)[:-1]]
        )

        lc = jnp.clip(lcodes.astype(jnp.int32), 0, num_codes - 1)
        match_counts = jnp.where(lvalid, counts[lc], 0)
        if mode == "semi":
            return (match_counts > 0,)
        if mode == "anti":
            return (lvalid & (match_counts == 0),)
        out_counts = match_counts
        if mode == "left_outer":
            out_counts = jnp.maximum(match_counts, 1)
        off = jnp.concatenate(
            [jnp.zeros((1,), out_counts.dtype), jnp.cumsum(out_counts)]
        )
        total = off[-1]
        # Expand: output slot j belongs to probe row i = the last row whose
        # offset is <= j; its rank within the row indexes the CSR bucket.
        out_idx = jnp.arange(out_capacity, dtype=jnp.int64)
        li = jnp.clip(
            jnp.searchsorted(off, out_idx, side="right") - 1, 0, n_l - 1
        ).astype(jnp.int32)
        rank = (out_idx - off[li]).astype(jnp.int32)
        code = jnp.clip(lcodes[li].astype(jnp.int32), 0, num_codes - 1)
        has_match = match_counts[li] > 0
        rpos = jnp.clip(starts[code] + rank, 0, n_r - 1)
        rrow = perm[rpos]
        slot_live = out_idx < total
        right_valid = slot_live & has_match
        outs = [jnp.asarray(total, jnp.int64).reshape(1), li, right_valid]
        for v, va in rv_pairs:
            outs.append(v[rrow])
            outs.append(va[rrow] & right_valid)
        return tuple(outs)

    args = [lk.data, lk.validity, rk.data, rk.validity]
    for c in rvals:
        args += [c.data, c.validity]
    in_specs = tuple(P(axis) for _ in args)
    if mode in ("semi", "anti"):
        out_specs = (P(axis),)
    else:
        out_specs = tuple(P(axis) for _ in range(3 + 2 * len(rvals)))
    f = jax.shard_map(step, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    jf = jax.jit(f)

    def run():
        res = jf(*args)
        if mode in ("semi", "anti"):
            return res[0]
        return res[0], res[1], res[2], res[3:]

    return run


def distributed_join_auto(
    left: PartitionedTable,
    right: PartitionedTable,
    key: str,
    num_codes: int,
    right_value_cols: Sequence[str],
    mode: str = "inner",
    initial_capacity: int | None = None,
    max_doublings: int = 8,
):
    """Duplicate-key join with geometric capacity escalation (the
    shuffle_by_key_auto pattern): run at a static per-shard capacity,
    detect overflow exactly from the returned totals, and re-jit at double
    the capacity until every shard fits."""
    import numpy as np

    if mode in ("semi", "anti"):
        return distributed_hash_join_multi(
            left, right, key, num_codes, right_value_cols, 1, mode
        )()
    n_shards = left.mesh.devices.size
    cap = initial_capacity or max(
        128, left.column(key).data.shape[0] // n_shards
    )
    for _ in range(max_doublings + 1):
        run = distributed_hash_join_multi(
            left, right, key, num_codes, right_value_cols, cap, mode
        )
        totals, li, rvalid, rvs = run()
        totals_np = np.asarray(totals)
        if int(totals_np.max(initial=0)) <= cap:
            return totals_np, li, rvalid, rvs, cap
        cap *= 2
    raise RuntimeError("join output exceeded capacity after escalation")
