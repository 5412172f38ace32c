"""Device mesh + partitioned tables.

A ``PartitionedTable`` holds a table's columns as device arrays sharded by
row over the mesh — the HBM-resident, always-ready-to-scan representation.
Partitioning is either round-robin by row (scan-only workloads) or hashed on
a key column (aggregation/join workloads ride ICI without reshuffling).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..columnbatch import ColumnBatch, KIND_DICT
from ..config import ROW_TILE


def make_mesh(n_devices: Optional[int] = None, axis: str = "shards") -> Mesh:
    """1D mesh over all (or the first n) devices. Multi-host pods reuse the
    same axis: jax.devices() spans hosts and XLA routes ICI vs DCN."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _pad_to(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


@dataclass
class ShardedColumn:
    name: str
    kind: str
    data: jax.Array  # [n_pad] sharded along axis 0
    validity: jax.Array  # [n_pad] bool, sharded


class PartitionedTable:
    """Row-sharded device mirror of a column batch.

    Rows are padded so each shard holds an equal, tile-aligned slice; padding
    rows are invalid. ``from_batch`` with a hash key redistributes rows so
    that equal keys land on the same shard (the shuffle happens once at load,
    all queries after that need no repartitioning — the analogue of the
    reference's insert-time pre-hashing, dynparquet/hashed.go:38).
    """

    def __init__(self, mesh: Mesh, axis: str = "shards"):
        self.mesh = mesh
        self.axis = axis
        self.columns: dict[str, ShardedColumn] = {}
        self.n_rows = 0
        self.n_pad = 0

    @property
    def n_shards(self) -> int:
        return self.mesh.shape[self.axis]

    @staticmethod
    def from_batch(
        batch: ColumnBatch,
        mesh: Mesh,
        axis: str = "shards",
        hash_key: Optional[str] = None,
    ) -> "PartitionedTable":
        t = PartitionedTable(mesh, axis)
        n = batch.num_rows
        n_shards = mesh.shape[axis]

        if hash_key is not None:
            key_col = batch.column(hash_key)
            assert key_col is not None, hash_key
            keys = key_col.values.astype(np.int64)
            shard_of_row = _hash_int64(keys) % n_shards
            order = np.argsort(shard_of_row, kind="stable")
            batch = batch.take(order)
            shard_of_row = shard_of_row[order]
            counts = np.bincount(shard_of_row, minlength=n_shards)
            per_shard = _pad_to(max(int(counts.max()), 1), ROW_TILE)
            # Scatter rows into equal-size shard slots.
            starts = np.zeros(n_shards, dtype=np.int64)
            starts[1:] = np.cumsum(counts)[:-1]
            dest = (
                shard_of_row * per_shard
                + (np.arange(n, dtype=np.int64) - starts[shard_of_row])
            )
        else:
            per_shard = _pad_to(-(-max(n, 1) // n_shards), ROW_TILE)
            dest = None  # rows packed contiguously

        n_pad = per_shard * n_shards
        sharding = NamedSharding(mesh, P(axis))
        for c in batch.columns:
            vals = np.zeros(n_pad, dtype=c.values.dtype)
            valid = np.zeros(n_pad, dtype=np.bool_)
            if dest is None:
                vals[:n] = c.values
                valid[:n] = c.validity
            else:
                vals[dest] = c.values
                valid[dest] = c.validity
            t.columns[c.name] = ShardedColumn(
                c.name,
                c.kind,
                jax.device_put(vals, sharding),
                jax.device_put(valid, sharding),
            )
        t.n_rows = n
        t.n_pad = n_pad
        t.host = batch
        return t

    def column(self, name: str) -> ShardedColumn:
        return self.columns[name]


def _hash_int64(x: np.ndarray) -> np.ndarray:
    """Multiply-shift mix (the reference hashes group keys with metro-hash,
    dynparquet/hashed.go:86; any good 64-bit mix works for partitioning)."""
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
    x = x ^ (x >> np.uint64(33))
    return (x & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def hash_int64_device(x: jax.Array) -> jax.Array:
    """Same mix on device (uint64 emulated via 32-bit lanes by XLA)."""
    x = x.astype(jnp.uint64)
    x = (x ^ (x >> jnp.uint64(33))) * jnp.uint64(0xFF51AFD7ED558CCD)
    x = (x ^ (x >> jnp.uint64(33))) * jnp.uint64(0xC4CEB9FE1A85EC53)
    x = x ^ (x >> jnp.uint64(33))
    return (x & jnp.uint64(0x7FFFFFFFFFFFFFFF)).astype(jnp.int64)
