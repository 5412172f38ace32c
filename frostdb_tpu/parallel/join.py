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
