"""Device-side all_to_all row repartitioning over the mesh.

The reference's only cross-worker data movement is shared object storage
(SURVEY.md §5.8); the TPU-native equivalent of a distributed exchange is an
``all_to_all`` over ICI inside ``shard_map``. Rows hash to destination
shards; each shard packs its rows into fixed-capacity per-destination
buckets (static shapes — the all_to_all block size cannot be data
dependent), exchanges, and compacts.

Capacity: with roughly uniform keys each destination receives about
``rows/n_shards`` from each sender; ``oversub`` (default 2x) covers
imbalance. Overflow is detected exactly (per-destination counts travel with
the exchange) and surfaces as a ShuffleOverflow.

Skew (SURVEY.md §7 hard parts): a heavy key overflows its destination no
matter the oversubscription — hashing co-locates ALL its rows. ``salt=S``
spreads each key over S shards (sub-shard = row position mod S, mixed into
the destination hash), so per-destination load is bounded by
``rows_of_heaviest_key / S``; consumers must then combine per-key partials
across sub-shards (natural for aggregations — the two-phase combine already
does it; join build sides need salt=1 or broadcast).
``shuffle_by_key_auto`` is the skew-aware entry: it detects overflow and
escalates the salt geometrically instead of blowing up capacity.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..config import ROW_TILE
from .mesh import PartitionedTable, ShardedColumn, hash_int64_device


class ShuffleOverflow(RuntimeError):
    pass


def shuffle_by_key(
    table: PartitionedTable,
    key: str,
    oversub: float = 2.0,
    salt: int = 1,
) -> PartitionedTable:
    """Repartition so equal keys co-locate (salt=1) or spread over ``salt``
    shards (skewed keys; see module docstring). Returns a new
    PartitionedTable whose shards hold the exchanged rows (padding rows
    invalid)."""
    mesh = table.mesh
    axis = table.axis
    n_shards = table.n_shards
    per_shard = table.n_pad // n_shards
    salt = max(1, min(int(salt), n_shards))
    # per-destination bucket capacity per sender (tile-aligned)
    cap = int(np.ceil(per_shard / n_shards * oversub / 128)) * 128
    cap = max(cap, 128)

    names = list(table.columns)
    kcol = table.column(key)

    def step(kdata, kvalid, *cols):
        # cols: flattened (data, validity) pairs per column, per-shard slices
        me = jax.lax.axis_index(axis)
        dest = (
            hash_int64_device(kdata.astype(jnp.int64)) % n_shards
        ).astype(jnp.int32)
        if salt > 1:
            # Sub-shard by row position: a key's rows round-robin over salt
            # consecutive destinations, bounding any one shard's share of a
            # heavy key to 1/salt of its rows per sender.
            sub = (
                jnp.arange(kdata.shape[0], dtype=jnp.int32) % jnp.int32(salt)
            )
            dest = (dest + sub) % jnp.int32(n_shards)
        dest = jnp.where(kvalid, dest, jnp.int32(n_shards))  # invalid last

        # stable sort rows by destination
        order = jnp.argsort(dest, stable=True)
        dest_sorted = jnp.take(dest, order)
        counts = jax.ops.segment_sum(
            jnp.ones_like(dest_sorted, dtype=jnp.int32),
            dest_sorted,
            num_segments=n_shards + 1,
        )[:n_shards]
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
        )
        overflow = (
            jax.lax.pmax((counts > cap).any().astype(jnp.int32), axis) > 0
        )

        # Bucket packing as a GATHER (scatter is slow on TPU): output slot
        # (b, p) pulls sorted row starts[b] + p while p < counts[b].
        out_idx = jnp.arange(n_shards * cap, dtype=jnp.int32)
        b = out_idx // cap
        p = out_idx % cap
        src = starts[b] + p
        in_bucket = p < counts[b]
        src = jnp.clip(src, 0, dest_sorted.shape[0] - 1)

        out_cols = []
        for data, validity in zip(cols[0::2], cols[1::2]):
            d_s = jnp.take(data, order)
            v_s = jnp.take(validity, order)
            packed = jnp.where(
                in_bucket, jnp.take(d_s, src), jnp.zeros_like(jnp.take(d_s, src))
            )
            pvalid = jnp.take(v_s, src) & in_bucket
            # exchange: [n_shards, cap] -> all_to_all over dim 0
            ex_d = jax.lax.all_to_all(
                packed.reshape(n_shards, cap), axis, 0, 0, tiled=False
            ).reshape(-1)
            ex_v = jax.lax.all_to_all(
                pvalid.reshape(n_shards, cap), axis, 0, 0, tiled=False
            ).reshape(-1)
            out_cols.extend([ex_d, ex_v])
        return (overflow,) + tuple(out_cols)

    args = [kcol.data, kcol.validity]
    for n in names:
        c = table.column(n)
        args.extend([c.data, c.validity])

    in_specs = tuple(P(axis) for _ in args)
    out_specs = (P(),) + tuple(P(axis) for _ in range(2 * len(names)))
    f = jax.shard_map(step, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    res = jax.jit(f)(*args)
    if bool(res[0]):
        raise ShuffleOverflow(
            f"destination bucket overflow (cap={cap}); retry with larger oversub"
        )

    out = PartitionedTable(mesh, axis)
    out.n_pad = n_shards * cap * n_shards  # per-shard rows * shards
    out.n_rows = table.n_rows
    it = iter(res[1:])
    for n in names:
        data = next(it)
        valid = next(it)
        src = table.column(n)
        out.columns[n] = ShardedColumn(n, src.kind, data, valid)
    return out


def shuffle_by_key_auto(
    table: PartitionedTable,
    key: str,
    oversub: float = 2.0,
    max_salt: Optional[int] = None,
) -> tuple[PartitionedTable, int]:
    """Skew-aware repartitioning: try the plain co-locating exchange, and on
    overflow escalate the salt geometrically (1 -> 2 -> 4 ...) before giving
    up — turning a heavy key's hot destination into balanced load instead of
    growing every bucket (SURVEY.md §5.8 skew-aware repartitioning).

    Returns ``(shuffled_table, salt_used)``; salt_used > 1 tells the caller
    equal keys now live on salt_used shards, so aggregation consumers must
    combine per-key partials across sub-shards (the two-phase final stage).
    """
    if max_salt is None:
        max_salt = table.n_shards
    salt = 1
    while True:
        try:
            return shuffle_by_key(table, key, oversub=oversub, salt=salt), salt
        except ShuffleOverflow:
            if salt >= max_salt:
                # fully salted and still overflowing: genuinely undersized
                # buckets, not skew — grow capacity once, then give up.
                return (
                    shuffle_by_key(
                        table, key, oversub=oversub * 2.0, salt=salt
                    ),
                    salt,
                )
            salt = min(salt * 2, max_salt)
