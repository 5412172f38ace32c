"""List/repeated columns end-to-end (reference:
pqarrow/builder/listbuilder.go, internal/records slices->lists).

TPU-native representation: per-row content hashes as the device value
(grouping/distinct treat lists as scalars), offsets + flat child host-side
for materialization. Covered: arrow round-trip, ingest, WAL recovery,
rotation to parquet and back, compaction with null backfill, group-by and
distinct on list columns, the records builder."""

import numpy as np
import pyarrow as pa
import pytest

from frostdb_tpu.columnbatch import (
    Column,
    ColumnBatch,
    KIND_DICT,
    KIND_INT64,
    KIND_LIST,
)
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.schema import (
    ColumnDef,
    SchemaDef,
    SortingColumnDef,
    StorageLayout,
    TYPE_INT64,
    TYPE_STRING,
)
from frostdb_tpu.store import FileSystemBucket
from frostdb_tpu.table import TableConfig


def list_schema() -> SchemaDef:
    return SchemaDef(
        name="lists",
        columns=[
            ColumnDef("name", StorageLayout(TYPE_STRING, nullable=True)),
            ColumnDef(
                "stacktrace",
                StorageLayout(TYPE_STRING, nullable=True, repeated=True),
            ),
            ColumnDef(
                "samples",
                StorageLayout(TYPE_INT64, nullable=True, repeated=True),
            ),
            ColumnDef("value", StorageLayout(TYPE_INT64, nullable=True)),
        ],
        sorting_columns=[SortingColumnDef("name", "asc")],
    )


ROWS = [
    ("a", ["main", "foo"], [1, 2, 3], 10),
    ("b", ["main", "bar", "baz"], [], 20),
    ("c", None, None, 30),
    ("d", [], [7], 40),
    ("e", ["main", "foo"], [1, 2, 3], 50),  # same lists as row a
]


def _arrow_batch():
    return pa.record_batch(
        {
            "name": pa.array([r[0] for r in ROWS]),
            "stacktrace": pa.array(
                [r[1] for r in ROWS], type=pa.list_(pa.string())
            ),
            "samples": pa.array(
                [r[2] for r in ROWS], type=pa.list_(pa.int64())
            ),
            "value": pa.array([r[3] for r in ROWS], type=pa.int64()),
        }
    )


def _mk(tmp_path=None):
    kwargs = {}
    if tmp_path is not None:
        bucket = FileSystemBucket(str(tmp_path / "bucket"))
        kwargs = dict(
            storage_path=str(tmp_path / "db"),
            enable_wal=True,
            sources=[bucket],
            sinks=[bucket],
        )
    store = ColumnStore(**kwargs)
    db = store.db("l")
    table = db.table("t", TableConfig(schema=list_schema()))
    return store, db, table


def _rows_of(db):
    out = []
    LocalEngine(db.table_provider()).scan_table("t").project(
        E.Col("name"), E.Col("stacktrace"), E.Col("samples"), E.Col("value")
    ).execute(out.append)
    rows = []
    for b in out:
        for i in range(b.num_rows):
            rows.append(
                tuple(b.column(n).py_value(i) for n in
                      ("name", "stacktrace", "samples", "value"))
            )
    return sorted(rows, key=lambda r: r[0])


def test_arrow_round_trip():
    b = ColumnBatch.from_arrow(_arrow_batch())
    st = b.column("stacktrace")
    assert st.kind == KIND_LIST
    assert st.py_value(0) == ["main", "foo"]
    assert st.py_value(2) is None
    assert st.py_value(3) == []
    # identical lists hash identically; different lists differ
    assert st.values[0] == st.values[4]
    assert st.values[0] != st.values[1]
    sam = b.column("samples")
    assert sam.py_value(0) == [1, 2, 3]
    assert sam.values[0] == sam.values[4]
    rb = b.to_arrow()
    b2 = ColumnBatch.from_arrow(rb)
    for i in range(b.num_rows):
        for c in ("name", "stacktrace", "samples", "value"):
            assert b2.column(c).py_value(i) == b.column(c).py_value(i)


def test_take_and_concat():
    b = ColumnBatch.from_arrow(_arrow_batch())
    t = b.take(np.asarray([4, 2, 0]))
    assert t.column("stacktrace").py_value(0) == ["main", "foo"]
    assert t.column("stacktrace").py_value(1) is None
    assert t.column("samples").py_value(2) == [1, 2, 3]
    from frostdb_tpu.query.physical import unify_concat

    # second batch lacks the list columns entirely -> null backfill keeps
    # the child structure (template path)
    b2 = ColumnBatch(
        [
            Column(
                "name",
                KIND_DICT,
                *b.column("name").dictionary.encode(["z"]),
                b.column("name").dictionary,
            ),
            Column(
                "value",
                KIND_INT64,
                np.asarray([99], dtype=np.int64),
                np.ones(1, dtype=bool),
            ),
        ],
        1,
    )
    merged = unify_concat([b, b2])
    assert merged.num_rows == 6
    assert merged.column("stacktrace").py_value(5) is None
    assert merged.column("stacktrace").py_value(0) == ["main", "foo"]


def test_table_ingest_query_and_group_by_list(tmp_path):
    store, db, table = _mk()
    table.insert_record(_arrow_batch(), sort=True)
    rows = _rows_of(db)
    assert rows == sorted(
        [(r[0], r[1], r[2], r[3]) for r in ROWS], key=lambda r: r[0]
    )

    # group by the list column: rows a+e share a stacktrace
    out = []
    LocalEngine(db.table_provider()).scan_table("t").aggregate(
        [E.Sum(E.Col("value"))], [E.Col("stacktrace")]
    ).execute(out.append)
    got = {}
    for b in out:
        k = b.column("stacktrace")
        v = b.column("sum(value)")
        for i in range(b.num_rows):
            key = tuple(k.py_value(i)) if k.py_value(i) is not None else None
            got[key] = int(v.values[i])
    assert got[("main", "foo")] == 60  # rows a + e
    assert got[("main", "bar", "baz")] == 20
    assert got[()] == 40

    # distinct over the list column
    out = []
    LocalEngine(db.table_provider()).scan_table("t").distinct(
        E.Col("stacktrace")
    ).execute(out.append)
    seen = set()
    for b in out:
        c = b.column("stacktrace")
        for i in range(b.num_rows):
            v = c.py_value(i)
            seen.add(tuple(v) if v is not None else None)
    assert seen == {("main", "foo"), ("main", "bar", "baz"), (), None}


def test_lists_survive_wal_recovery_and_rotation(tmp_path):
    store, db, table = _mk(tmp_path)
    table.insert_record(_arrow_batch(), sort=True)
    expect = _rows_of(db)

    # WAL recovery
    store.close()
    store, db, table = _mk(tmp_path)
    assert _rows_of(db) == expect

    # rotation -> parquet block -> read back through the source-part cache
    table.rotate_block()
    assert _rows_of(db) == expect
    store.close()
    store, db, table = _mk(tmp_path)
    assert _rows_of(db) == expect
    store.close()


def test_compaction_merges_list_parts():
    store, db, table = _mk()
    table.insert_record(_arrow_batch(), sort=True)
    table.insert_record(_arrow_batch(), sort=True)
    table.active_block.index.compact_level(0)
    assert table.active_block.index.num_parts() == 1
    rows = _rows_of(db)
    assert len(rows) == 2 * len(ROWS)
    assert rows[0][1] == ["main", "foo"]


def test_records_builder_repeated_fields():
    from frostdb_tpu.records import build_batch

    store, db, table = _mk()
    batch = build_batch(
        table,
        [
            {"name": "x", "stacktrace": ["a", "b"], "samples": [1], "value": 1},
            {"name": "y", "stacktrace": None, "samples": [2, 3], "value": 2},
        ],
    )
    assert batch.column("stacktrace").kind == KIND_LIST
    assert batch.column("stacktrace").py_value(0) == ["a", "b"]
    assert batch.column("stacktrace").py_value(1) is None
    assert batch.column("samples").py_value(1) == [2, 3]
    table.insert_record(batch, sort=True)
    rows = _rows_of(db)
    assert rows[0] == ("x", ["a", "b"], [1], 1)
