"""Host-side columnar batches with table-global string dictionaries.

This is the in-memory data model that replaces the reference's Arrow records
(pqarrow/arrow.go) with a TPU-friendly SoA layout:

- Numeric columns are dense numpy vectors + validity bitmaps; null slots hold
  zero, which exactly reproduces the reference's aggregation semantics (its
  sum/min/max kernels run over the raw value buffers including null slots,
  query/physicalplan/aggregate.go:763 `math.Int64.Sum`).
- String columns are int32 codes into an append-only *table-global*
  dictionary. This is the core TPU design decision: device kernels only ever
  see integer codes, string predicates (==, regexp, contains) are evaluated
  once on the (small) dictionary host-side and become code-membership masks
  on device — the vectorized generalization of the reference's
  dictionary-compare trick (query/physicalplan/binaryscalarexpr.go:194
  `DictionaryArrayScalarEqual` compares dictionary values once).

Arrow/parquet appear only at the edges (ingest, WAL/snapshot serialization,
object-storage persistence) via pyarrow.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field as dc_field
from typing import Iterable, Mapping, Sequence

import numpy as np
import pyarrow as pa

from .schema import (
    ColumnDef,
    Schema,
    SortingColumnDef,
    StorageLayout,
    TYPE_BOOL,
    TYPE_DOUBLE,
    TYPE_INT64,
    TYPE_STRING,
    TYPE_UINT64,
    is_dynamic_name,
    split_dynamic,
)

# Column kinds (device representation)
KIND_INT64 = "int64"
KIND_UINT64 = "uint64"
KIND_FLOAT64 = "float64"
KIND_BOOL = "bool"
KIND_DICT = "dict"  # string -> int32 codes into a Dictionary

_KIND_NP_DTYPE = {
    KIND_INT64: np.int64,
    KIND_UINT64: np.uint64,
    KIND_FLOAT64: np.float64,
    KIND_BOOL: np.bool_,
    KIND_DICT: np.int32,
}


def kind_for_layout(layout: StorageLayout) -> str:
    t = layout.type
    if t == TYPE_STRING:
        return KIND_DICT
    if t == TYPE_INT64:
        return KIND_INT64
    if t == TYPE_UINT64:
        return KIND_UINT64
    if t == TYPE_DOUBLE:
        return KIND_FLOAT64
    if t == TYPE_BOOL:
        return KIND_BOOL
    raise ValueError(f"unsupported storage type {t!r}")


_M1 = 0xFF51AFD7ED558CCD
_M2 = 0xC4CEB9FE1A85EC53
_M3 = 0x9DDFEA08EB382D69
_MASK = (1 << 64) - 1


def _mix64(x: int) -> int:
    x ^= x >> 33
    x = (x * _M1) & _MASK
    x ^= x >> 33
    x = (x * _M2) & _MASK
    x ^= x >> 33
    return x


def _hash64(s: str) -> int:
    """Deterministic 64-bit string hash used for pre-hashed columns
    (reference: dynparquet/hashed.go:86 `HashArray` uses metro-hash).
    Mirrors native/frostdb_native.cpp hash_bytes so native and Python
    dictionaries produce identical pre-hash columns."""
    data = s.encode("utf-8", "surrogateescape")
    n = len(data)
    h = (0x9E3779B97F4A7C15 ^ n) & _MASK
    i = 0
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        h = (_mix64(h ^ k) * _M3) & _MASK
        i += 8
    tail = int.from_bytes(data[i:], "little") if i < n else 0
    h = _mix64(h ^ tail)
    return h - (1 << 64) if h >= (1 << 63) else h


class Dictionary:
    """Append-only string dictionary shared by all parts of a table column.

    Codes are stable for the lifetime of the table, so device-resident parts
    written at different times remain directly comparable — the analogue of
    the reference re-dictionarifying on merge (pqarrow/arrowutils/sort.go
    dictionary Take path), hoisted to ingest time.

    Backed by the native C++ runtime (native/frostdb_native.cpp) when the
    toolchain is available; the pure-Python fallback is hash-identical.
    """

    def __init__(self, use_native: bool | None = None) -> None:
        self._native = None
        if use_native is not False:
            from . import native as _native_mod

            if _native_mod.available():
                self._native = _native_mod.NativeDict()
        self._values: list[str] = []
        self._index: dict[str, int] = {}
        self._hashes: list[int] = []

    def __len__(self) -> int:
        if self._native is not None:
            return len(self._native)
        return len(self._values)

    @property
    def values(self) -> list[str]:
        if self._native is not None:
            return self._native.values()
        return self._values

    def code(self, value: str) -> int:
        if self._native is not None:
            codes, _valid = self._native.encode_batch([value])
            return int(codes[0])
        c = self._index.get(value)
        if c is None:
            c = len(self._values)
            self._values.append(value)
            self._index[value] = c
            self._hashes.append(_hash64(value))
        return c

    def lookup(self, value: str) -> int | None:
        """Code for value, or None if the value has never been seen."""
        if self._native is not None:
            return self._native.lookup(value)
        return self._index.get(value)

    def hash_for_code(self) -> np.ndarray:
        if self._native is not None:
            return self._native.hashes()
        return np.asarray(self._hashes, dtype=np.int64)

    def encode(self, values: Iterable[str | None]) -> tuple[np.ndarray, np.ndarray]:
        vals = list(values)
        if self._native is not None:
            return self._native.encode_batch(vals)
        codes: list[int] = []
        valid: list[bool] = []
        for v in vals:
            if v is None:
                codes.append(0)
                valid.append(False)
            else:
                codes.append(self.code(v))
                valid.append(True)
        return (
            np.asarray(codes, dtype=np.int32),
            np.asarray(valid, dtype=np.bool_),
        )

    def value_array(self) -> np.ndarray:
        return np.asarray(self.values, dtype=object)

    def sort_ranks(self) -> np.ndarray:
        """rank[code] = position of the code's value in sorted value order.
        Used to sort rows by string value while the device representation
        stays code-based."""
        values = self.values
        vals = np.asarray(values, dtype="U") if values else np.asarray([], dtype="U")
        order = np.argsort(vals, kind="stable")
        ranks = np.empty(len(order), dtype=np.int64)
        ranks[order] = np.arange(len(order), dtype=np.int64)
        return ranks


@dataclass
class Column:
    """One column of a host batch."""

    name: str
    kind: str
    values: np.ndarray  # dtype per kind; null slots hold 0/False
    validity: np.ndarray  # bool; True = non-null
    dictionary: Dictionary | None = None
    # Layout metadata carried through for parquet round-trips.
    layout: StorageLayout | None = None

    def __post_init__(self) -> None:
        assert self.values.shape == self.validity.shape, (
            self.name,
            self.values.shape,
            self.validity.shape,
        )
        if self.kind == KIND_DICT:
            assert self.dictionary is not None

    def __len__(self) -> int:
        return len(self.values)

    def take(self, indices: np.ndarray) -> "Column":
        return Column(
            self.name,
            self.kind,
            self.values[indices],
            self.validity[indices],
            self.dictionary,
            self.layout,
        )

    def null_count(self) -> int:
        return int((~self.validity).sum())

    def py_value(self, i: int):
        """Python value at row i (None when null)."""
        if not self.validity[i]:
            return None
        if self.kind == KIND_DICT:
            return self.dictionary.values[int(self.values[i])]
        v = self.values[i]
        if self.kind == KIND_BOOL:
            return bool(v)
        if self.kind == KIND_FLOAT64:
            return float(v)
        return int(v)

    @staticmethod
    def all_null(
        name: str, kind: str, n: int, dictionary: Dictionary | None = None,
        layout: StorageLayout | None = None,
    ) -> "Column":
        """Virtual all-null column (reference: pqarrow/nullarray.go
        `VirtualNullArray`, dynparquet/nil_chunk.go `NilColumnChunk`)."""
        return Column(
            name,
            kind,
            np.zeros(n, dtype=_KIND_NP_DTYPE[kind]),
            np.zeros(n, dtype=np.bool_),
            dictionary,
            layout,
        )


class ColumnBatch:
    """An ordered set of equal-length columns — the unit of data flowing
    through the engine (the reference's arrow.Record analogue)."""

    def __init__(self, columns: Sequence[Column], num_rows: int | None = None):
        self.columns: list[Column] = list(columns)
        if num_rows is None:
            if not self.columns:
                raise ValueError("empty batch requires explicit num_rows")
            num_rows = len(self.columns[0])
        self.num_rows = num_rows
        for c in self.columns:
            assert len(c) == num_rows, (c.name, len(c), num_rows)
        self._by_name = {c.name: c for c in self.columns}

    def __len__(self) -> int:
        return self.num_rows

    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]

    def column(self, name: str) -> Column | None:
        return self._by_name.get(name)

    def signature(self) -> tuple[tuple[str, str], ...]:
        """Column-set signature: the jit-cache key component. Two batches
        with equal signatures run through the same compiled executable."""
        return tuple((c.name, c.kind) for c in self.columns)

    def dynamic_columns(self) -> dict[str, list[str]]:
        """Concrete dynamic columns present, by family
        (reference: pqarrow/parquet.go:322 `RecordDynamicCols`)."""
        out: dict[str, list[str]] = {}
        for c in self.columns:
            if is_dynamic_name(c.name):
                fam, sub = split_dynamic(c.name)
                out.setdefault(fam, []).append(sub)
        return {k: sorted(v) for k, v in out.items()}

    def take(self, indices: np.ndarray) -> "ColumnBatch":
        return ColumnBatch([c.take(indices) for c in self.columns], len(indices))

    def select_mask(self, mask: np.ndarray) -> "ColumnBatch":
        idx = np.nonzero(mask)[0]
        return self.take(idx)

    def slice(self, start: int, length: int) -> "ColumnBatch":
        idx = np.arange(start, min(start + length, self.num_rows))
        return self.take(idx)

    def with_columns(self, cols: Sequence[Column]) -> "ColumnBatch":
        return ColumnBatch(list(self.columns) + list(cols), self.num_rows)

    def project(self, names: Sequence[str]) -> "ColumnBatch":
        cols = []
        for n in names:
            c = self._by_name.get(n)
            if c is not None:
                cols.append(c)
        return ColumnBatch(cols, self.num_rows)

    # ------------------------------------------------------------------
    # Sorting (reference: dynparquet Buffer.Sort / pqarrow SortRecord)

    def sort_indices(
        self, sorting: Sequence[tuple[str, SortingColumnDef]]
    ) -> np.ndarray:
        """Stable multi-key sort indices by the given concrete sorting
        columns. Missing columns sort as null (reference:
        dynparquet/row.go:68 DynamicRow comparison backfills nulls)."""
        keys: list[np.ndarray] = []
        for name, s in sorting:
            col = self._by_name.get(name)
            if col is None:
                continue  # all-null: no effect on ordering
            if col.kind == KIND_DICT:
                ranks = col.dictionary.sort_ranks()
                if len(ranks) == 0:
                    key = np.zeros(len(col), dtype=np.int64)
                else:
                    key = ranks[col.values.astype(np.int64)] + 1
            elif col.kind == KIND_BOOL:
                key = col.values.astype(np.int64) + 1
            elif col.kind == KIND_FLOAT64:
                key = col.values.astype(np.float64)
            else:
                key = col.values.astype(np.int64) + 1 - 1  # copy
            key = key.astype(np.float64) if col.kind == KIND_FLOAT64 else key
            # Null placement: nulls_first -> below all values; else above.
            if col.kind == KIND_FLOAT64:
                nullkey = -np.inf if s.nulls_first else np.inf
                key = np.where(col.validity, key, nullkey)
            else:
                big = np.int64(2**62)
                nullkey = -big if s.nulls_first else big
                key = np.where(col.validity, key, nullkey)
            if s.direction == "desc":
                key = -key
            keys.append(key)
        if not keys:
            return np.arange(self.num_rows)
        # np.lexsort: last key is primary.
        return np.lexsort(tuple(reversed(keys)))

    def sort_by(self, sorting: Sequence[tuple[str, SortingColumnDef]]) -> "ColumnBatch":
        return self.take(self.sort_indices(sorting))

    # ------------------------------------------------------------------
    # Schema unification (reference: pqarrow/arrowutils/schema.go
    # EnsureSameSchema / mergeArrowSchemas)

    def conform(
        self,
        concrete: Sequence[tuple[str, ColumnDef]],
        dictionaries: Mapping[str, Dictionary],
    ) -> "ColumnBatch":
        """Return a batch with exactly the given concrete columns in order,
        backfilling missing ones with virtual nulls."""
        cols: list[Column] = []
        for full_name, cdef in concrete:
            c = self._by_name.get(full_name)
            if c is None:
                kind = kind_for_layout(cdef.layout)
                fam = split_dynamic(full_name)[0] if is_dynamic_name(full_name) else full_name
                c = Column.all_null(
                    full_name,
                    kind,
                    self.num_rows,
                    dictionaries.get(fam) if kind == KIND_DICT else None,
                    cdef.layout,
                )
            cols.append(c)
        return ColumnBatch(cols, self.num_rows)

    # ------------------------------------------------------------------
    # Pre-hashed columns (reference: dynparquet/hashed.go:38 PrehashColumns)

    def prehash(self, schema: Schema) -> "ColumnBatch":
        fams = set(schema.prehash_families())
        if not fams:
            return self
        extra: list[Column] = []
        for c in self.columns:
            fam = split_dynamic(c.name)[0] if is_dynamic_name(c.name) else c.name
            if fam not in fams or c.name.startswith(HASHED_PREFIX):
                continue
            if c.kind == KIND_DICT:
                code_hash = c.dictionary.hash_for_code()
                if len(code_hash) == 0:
                    hashed = np.zeros(self.num_rows, dtype=np.int64)
                else:
                    hashed = code_hash[c.values.astype(np.int64)]
            else:
                hashed = c.values.astype(np.int64)
            hashed = np.where(c.validity, hashed, np.int64(0))
            extra.append(
                Column(
                    HASHED_PREFIX + c.name,
                    KIND_INT64,
                    hashed,
                    np.ones(self.num_rows, dtype=np.bool_),
                )
            )
        if not extra:
            return self
        return self.with_columns(extra)

    def without_hashed(self) -> "ColumnBatch":
        cols = [c for c in self.columns if not c.name.startswith(HASHED_PREFIX)]
        return ColumnBatch(cols, self.num_rows)

    # ------------------------------------------------------------------
    # Arrow interop

    def to_arrow(self) -> pa.RecordBatch:
        arrays = []
        fields = []
        for c in self.columns:
            mask = ~c.validity
            if c.kind == KIND_DICT:
                dict_values = pa.array(c.dictionary.values, type=pa.string())
                indices = pa.array(c.values.astype(np.int32), mask=mask)
                arr = pa.DictionaryArray.from_arrays(indices, dict_values)
            elif c.kind == KIND_BOOL:
                arr = pa.array(c.values, type=pa.bool_(), mask=mask)
            elif c.kind == KIND_FLOAT64:
                arr = pa.array(c.values, type=pa.float64(), mask=mask)
            elif c.kind == KIND_UINT64:
                arr = pa.array(c.values, type=pa.uint64(), mask=mask)
            else:
                arr = pa.array(c.values, type=pa.int64(), mask=mask)
            arrays.append(arr)
            fields.append(pa.field(c.name, arr.type, nullable=True))
        return pa.RecordBatch.from_arrays(arrays, schema=pa.schema(fields))

    @staticmethod
    def from_arrow(
        rb: pa.RecordBatch | pa.Table,
        dictionaries: Mapping[str, Dictionary] | None = None,
        get_dictionary=None,
    ) -> "ColumnBatch":
        """Ingest an Arrow batch, re-encoding string/dictionary columns into
        table-global dictionaries. ``get_dictionary(family)`` supplies the
        dictionary for a column family; falls back to fresh per-call dicts.
        """
        if isinstance(rb, pa.Table):
            rb = rb.combine_chunks()
            batches = rb.to_batches()
            if len(batches) == 1:
                rb = batches[0]
            else:
                rb = pa.Table.from_batches(batches).combine_chunks().to_batches()[0]
        local_dicts: dict[str, Dictionary] = {}

        def dict_for(name: str) -> Dictionary:
            fam = split_dynamic(name)[0] if is_dynamic_name(name) else name
            if get_dictionary is not None:
                return get_dictionary(fam)
            if dictionaries is not None and fam in dictionaries:
                return dictionaries[fam]
            return local_dicts.setdefault(fam, Dictionary())

        cols: list[Column] = []
        n = rb.num_rows
        for i, f in enumerate(rb.schema):
            arr = rb.column(i)
            t = f.type
            if pa.types.is_dictionary(t):
                t = t.value_type
            if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
                d = dict_for(f.name)
                pylist = arr.to_pylist()
                pylist = [
                    v.decode("utf-8", "surrogateescape") if isinstance(v, bytes) else v
                    for v in pylist
                ]
                codes, valid = d.encode(pylist)
                cols.append(Column(f.name, KIND_DICT, codes, valid, d))
            elif pa.types.is_boolean(t):
                np_valid = np.asarray(arr.is_valid())
                vals = np.asarray(arr.fill_null(False), dtype=np.bool_)
                cols.append(Column(f.name, KIND_BOOL, vals, np_valid))
            elif pa.types.is_floating(t):
                np_valid = np.asarray(arr.is_valid())
                vals = np.asarray(arr.cast(pa.float64()).fill_null(0.0), dtype=np.float64)
                cols.append(Column(f.name, KIND_FLOAT64, vals, np_valid))
            elif pa.types.is_unsigned_integer(t):
                np_valid = np.asarray(arr.is_valid())
                vals = np.asarray(arr.cast(pa.uint64()).fill_null(0), dtype=np.uint64)
                cols.append(Column(f.name, KIND_UINT64, vals, np_valid))
            elif pa.types.is_integer(t):
                np_valid = np.asarray(arr.is_valid())
                vals = np.asarray(arr.cast(pa.int64()).fill_null(0), dtype=np.int64)
                cols.append(Column(f.name, KIND_INT64, vals, np_valid))
            else:
                raise ValueError(f"unsupported arrow type {f.type} for column {f.name}")
        return ColumnBatch(cols, n)


HASHED_PREFIX = "hashed."


def concat_batches(batches: Sequence[ColumnBatch]) -> ColumnBatch:
    """Concatenate batches with identical signatures."""
    assert batches
    if len(batches) == 1:
        return batches[0]
    sig = batches[0].signature()
    for b in batches[1:]:
        assert b.signature() == sig, "concat requires identical signatures"
    cols = []
    for i, c0 in enumerate(batches[0].columns):
        vals = np.concatenate([b.columns[i].values for b in batches])
        valid = np.concatenate([b.columns[i].validity for b in batches])
        cols.append(Column(c0.name, c0.kind, vals, valid, c0.dictionary, c0.layout))
    return ColumnBatch(cols, sum(b.num_rows for b in batches))
