"""DB lifecycle tests (reference: db_test.go — TestDBWithWALAndBucket
db_test.go:40, TestDBRecover db_test.go:1151, snapshot fallback
db_test.go:3033, Test_DB_WithStorage db_test.go:271)."""

import os

import numpy as np
import pytest

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.store import FileSystemBucket
from frostdb_tpu.table import TableConfig


def _make_batch(table, n=3, ts_start=1):
    d_et = table.dictionary("example_type")
    d_labels = table.dictionary("labels")
    d_st = table.dictionary("stacktrace")
    et_codes, et_valid = d_et.encode(["cpu"] * n)
    l_codes, l_valid = d_labels.encode([f"v{i}" for i in range(n)])
    st_codes, st_valid = d_st.encode(["stack"] * n)
    from frostdb_tpu.columnbatch import KIND_DICT

    cols = [
        Column("example_type", KIND_DICT, et_codes, et_valid, d_et),
        Column("labels.label1", KIND_DICT, l_codes, l_valid, d_labels),
        Column("stacktrace", KIND_DICT, st_codes, st_valid, d_st),
        Column(
            "timestamp",
            KIND_INT64,
            np.arange(ts_start, ts_start + n, dtype=np.int64),
            np.ones(n, dtype=bool),
        ),
        Column(
            "value",
            KIND_INT64,
            np.arange(1, n + 1, dtype=np.int64),
            np.ones(n, dtype=bool),
        ),
    ]
    return ColumnBatch(cols, n)


def _query_sum(db, name):
    engine = LocalEngine(db.table_provider())
    out = []
    engine.scan_table(name).aggregate(
        [E.Sum(E.Col("value"))], [E.Col("example_type")]
    ).execute(lambda b: out.append(b))
    assert out, "no results"
    c = out[0].column("sum(value)")
    return int(c.values[0])


def test_insert_and_query_in_memory():
    store = ColumnStore()
    db = store.db("test")
    table = db.table("t", TableConfig(schema=sample_definition()))
    table.insert_record(_make_batch(table))
    assert _query_sum(db, "t") == 6
    assert db.high_watermark() == 2  # table creation + insert


def test_wal_replay(tmp_path):
    path = str(tmp_path)
    store = ColumnStore(storage_path=path, enable_wal=True)
    db = store.db("test")
    table = db.table("t", TableConfig(schema=sample_definition()))
    table.insert_record(_make_batch(table))
    table.insert_record(_make_batch(table, ts_start=10))
    wm = db.high_watermark()
    assert _query_sum(db, "t") == 12
    store.close()

    store2 = ColumnStore(storage_path=path, enable_wal=True)
    db2 = store2.db("test")
    assert "t" in db2.tables
    assert db2.high_watermark() == wm
    assert _query_sum(db2, "t") == 12
    store2.close()


def test_snapshot_and_recovery(tmp_path):
    path = str(tmp_path)
    store = ColumnStore(storage_path=path, enable_wal=True)
    db = store.db("test")
    table = db.table("t", TableConfig(schema=sample_definition()))
    table.insert_record(_make_batch(table))

    from frostdb_tpu.snapshot import write_snapshot

    tx = write_snapshot(db, db.snapshot_dir)
    assert tx == db.high_watermark()
    table.insert_record(_make_batch(table, ts_start=10))
    store.close()

    store2 = ColumnStore(storage_path=path, enable_wal=True)
    db2 = store2.db("test")
    assert _query_sum(db2, "t") == 12
    store2.close()


def test_corrupt_snapshot_falls_back(tmp_path):
    path = str(tmp_path)
    store = ColumnStore(storage_path=path, enable_wal=True)
    db = store.db("test")
    table = db.table("t", TableConfig(schema=sample_definition()))
    table.insert_record(_make_batch(table))
    from frostdb_tpu.snapshot import snapshot_path, write_snapshot

    tx1 = write_snapshot(db, db.snapshot_dir)
    table.insert_record(_make_batch(table, ts_start=10))
    tx2 = write_snapshot(db, db.snapshot_dir)
    # corrupt the newest snapshot
    p = snapshot_path(db.snapshot_dir, tx2)
    with open(p, "r+b") as f:
        f.seek(-2, os.SEEK_END)
        f.write(b"xx")
    store.close()

    from frostdb_tpu.snapshot import get_latest_valid_snapshot_txn

    # tx1 was cleaned after tx2's successful write; WAL replays the rest.
    store2 = ColumnStore(storage_path=path, enable_wal=True)
    db2 = store2.db("test")
    assert _query_sum(db2, "t") == 12
    store2.close()


def test_block_persistence_to_bucket(tmp_path):
    bucket = FileSystemBucket(str(tmp_path / "bucket"))
    store = ColumnStore(
        storage_path=str(tmp_path / "db"),
        enable_wal=True,
        sources=[bucket],
        sinks=[bucket],
    )
    db = store.db("test")
    table = db.table(
        "t",
        TableConfig(schema=sample_definition(), active_memory_size=1),
    )
    # active_memory_size=1 forces rotation after each insert; the persist
    # runs on the rotation worker, so sync() is the barrier before
    # inspecting the bucket (reference: table.Sync).
    table.insert_record(_make_batch(table))
    table.sync()
    assert bucket.blocks("test", "t"), "block not uploaded"
    table.insert_record(_make_batch(table, ts_start=10))
    assert _query_sum(db, "t") == 12
    store.close()

    # Recovery must not double-count persisted writes.
    store2 = ColumnStore(
        storage_path=str(tmp_path / "db"),
        enable_wal=True,
        sources=[bucket],
        sinks=[bucket],
    )
    db2 = store2.db("test")
    assert _query_sum(db2, "t") == 12
    store2.close()


def test_wal_corrupt_tail(tmp_path):
    path = str(tmp_path)
    store = ColumnStore(storage_path=path, enable_wal=True)
    db = store.db("test")
    table = db.table("t", TableConfig(schema=sample_definition()))
    table.insert_record(_make_batch(table))
    store.close()
    # append garbage to the wal segment
    wal_dir = os.path.join(path, "databases", "test", "wal")
    seg = sorted(os.listdir(wal_dir))[0]
    with open(os.path.join(wal_dir, seg), "ab") as f:
        f.write(b"\x13\x07garbage-torn-write")

    store2 = ColumnStore(storage_path=path, enable_wal=True)
    db2 = store2.db("test")
    assert _query_sum(db2, "t") == 6
    store2.close()


def test_read_isolation():
    """Readers must not see uncommitted/future txns (reference:
    table_test.go:272)."""
    store = ColumnStore()
    db = store.db("test")
    table = db.table("t", TableConfig(schema=sample_definition()))
    table.insert_record(_make_batch(table))
    wm = db.high_watermark()
    # Simulate a write with a future tx directly in the LSM.
    future_tx = wm + 100
    table.active_block.index.add(future_tx, _make_batch(table, ts_start=50))
    assert _query_sum(db, "t") == 6  # future tx invisible
