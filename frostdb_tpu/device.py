"""Device-resident column data.

A ``DeviceBatch`` mirrors a host ``ColumnBatch`` as padded, static-shape jnp
arrays: data vector + validity mask per column, padded to ``config.pad_length``
rows so XLA compiles one executable per (column-set signature, padded size)
instead of one per row count. Padding rows are invalid (validity False) and
excluded from every kernel by the selection mask.

This replaces the reference's Arrow record memory with HBM-resident SoA
vectors (the design stance of SURVEY.md §7; the reference's in-memory format
is Arrow, README.md:60).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import pad_length
from .columnbatch import (
    Column,
    ColumnBatch,
    KIND_BOOL,
    KIND_DICT,
    KIND_FLOAT64,
    KIND_INT64,
    KIND_UINT64,
)

_KIND_JNP_DTYPE = {
    KIND_INT64: jnp.int64,
    KIND_UINT64: jnp.uint64,
    KIND_FLOAT64: jnp.float64,
    KIND_BOOL: jnp.bool_,
    KIND_DICT: jnp.int32,
    # Lists upload their per-row content hashes (see columnbatch.KIND_LIST):
    # device kernels group/distinct lists as scalar hash keys while the
    # variable-length payload stays host-side.
    "list": jnp.int64,
}


@dataclass
class DeviceColumn:
    name: str
    kind: str
    data: jax.Array  # [n_pad]
    validity: jax.Array  # [n_pad] bool

    def to_host(self, n_rows: int, host_col: Column) -> Column:
        return Column(
            self.name,
            self.kind,
            np.asarray(self.data)[:n_rows],
            np.asarray(self.validity)[:n_rows],
            host_col.dictionary if host_col is not None else None,
        )


class DeviceBatch:
    """Padded device mirror of a host batch."""

    def __init__(self, cb: ColumnBatch):
        self.host = cb
        self.n_rows = cb.num_rows
        self.n_pad = pad_length(max(cb.num_rows, 1))
        self._cols: dict[str, DeviceColumn] = {}

    def column(self, name: str) -> DeviceColumn | None:
        dc = self._cols.get(name)
        if dc is not None:
            return dc
        hc = self.host.column(name)
        if hc is None:
            return None
        dc = self._upload(hc)
        self._cols[name] = dc
        return dc

    def _upload(self, hc: Column) -> DeviceColumn:
        pad = self.n_pad - self.n_rows
        dtype = _KIND_JNP_DTYPE[hc.kind]
        vals = np.zeros(self.n_pad, dtype=np.asarray(hc.values).dtype)
        vals[: self.n_rows] = hc.values
        valid = np.zeros(self.n_pad, dtype=np.bool_)
        valid[: self.n_rows] = hc.validity
        del pad
        return DeviceColumn(
            hc.name,
            hc.kind,
            jnp.asarray(vals, dtype=dtype),
            jnp.asarray(valid),
        )

    def derived(self, key: str, compute) -> DeviceColumn:
        """Cached upload of a column DERIVED from this batch's host data
        (e.g. float-sum digit planes, floatsum.py): ``compute()`` returns a
        host Column; the upload happens once per (batch, key)."""
        dc = self._cols.get(key)
        if dc is None:
            dc = self._cols[key] = self._upload(compute())
        return dc

    def row_valid_mask(self) -> jax.Array:
        """Mask selecting real (non-padding) rows."""
        return jnp.arange(self.n_pad) < self.n_rows


# Process-wide upload accounting (host->HBM transfers of sharded part
# mirrors) — lets tests assert the mesh scan is incremental: an insert
# between two queries uploads only the new part's bytes.
SHARDED_UPLOAD_STATS = {"columns": 0, "bytes": 0}


class ShardedDeviceBatch:
    """Row-sharded device mirror of a host batch over a mesh axis.

    The mesh analogue of ``DeviceBatch``: each column is one [n_pad] array
    sharded along the mesh axis, rows packed contiguously (part row r lives
    on shard ``r // per_shard`` at offset ``r % per_shard``), padding rows
    carry validity False and sit past ``n_rows``. Parts cache one of these
    per (mesh, axis) — the incremental upload unit of the distributed scan
    (the role the reference's per-part incremental Scan plays,
    index/lsm.go:401): a part-set change uploads only the NEW parts'
    columns, never the whole table.
    """

    def __init__(self, cb: ColumnBatch, mesh, axis: str):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .config import ROW_TILE

        self.host = cb
        self.mesh = mesh
        self.axis = axis
        self.n_rows = cb.num_rows
        n_shards = mesh.shape[axis]
        per = -(-max(cb.num_rows, 1) // n_shards)
        self.per_shard = ((per + ROW_TILE - 1) // ROW_TILE) * ROW_TILE
        self.n_pad = self.per_shard * n_shards
        self.sharding = NamedSharding(mesh, P(axis))
        self.replicated = NamedSharding(mesh, P())
        self._cols: dict[str, DeviceColumn] = {}

    def column(self, name: str) -> DeviceColumn | None:
        dc = self._cols.get(name)
        if dc is not None:
            return dc
        hc = self.host.column(name)
        if hc is None:
            return None
        dtype = _KIND_JNP_DTYPE[hc.kind]
        vals = np.zeros(self.n_pad, dtype=np.asarray(hc.values).dtype)
        vals[: self.n_rows] = hc.values
        valid = np.zeros(self.n_pad, dtype=np.bool_)
        valid[: self.n_rows] = hc.validity
        dc = DeviceColumn(
            hc.name,
            hc.kind,
            jax.device_put(np.asarray(vals, dtype=dtype), self.sharding),
            jax.device_put(valid, self.sharding),
        )
        SHARDED_UPLOAD_STATS["columns"] += 1
        SHARDED_UPLOAD_STATS["bytes"] += vals.nbytes + valid.nbytes
        self._cols[name] = dc
        return dc

    def derived(self, key: str, compute) -> DeviceColumn:
        """Cached sharded upload of a derived column (see
        DeviceBatch.derived); rides the same per-(mesh, axis) part cache,
        so a part set change uploads only new parts' planes."""
        dc = self._cols.get(key)
        if dc is not None:
            return dc
        hc = compute()
        dtype = _KIND_JNP_DTYPE[hc.kind]
        vals = np.zeros(self.n_pad, dtype=np.asarray(hc.values).dtype)
        vals[: self.n_rows] = hc.values
        valid = np.zeros(self.n_pad, dtype=np.bool_)
        valid[: self.n_rows] = hc.validity
        dc = DeviceColumn(
            hc.name,
            hc.kind,
            jax.device_put(np.asarray(vals, dtype=dtype), self.sharding),
            jax.device_put(valid, self.sharding),
        )
        SHARDED_UPLOAD_STATS["columns"] += 1
        SHARDED_UPLOAD_STATS["bytes"] += vals.nbytes + valid.nbytes
        self._cols[key] = dc
        return dc
