"""Background rotation + compaction (VERDICT round-2 item 5; reference:
table.go:621 `go t.writeBlock`, index/lsm.go:341 `go l.compact`): inserts
proceed while a rotated block persists on the worker, visibility never
lapses mid-persist, and failures surface on the next insert/sync."""

import threading
import time

import numpy as np
import pytest

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.store import FileSystemBucket
from frostdb_tpu.table import TableConfig


class GatedBucket(FileSystemBucket):
    """A sink whose upload blocks until released — the slow-fake-sink probe
    for in-flight rotations."""

    def __init__(self, root):
        super().__init__(root)
        self.gate = threading.Event()
        self.upload_started = threading.Event()
        self.uploads = 0
        self.fail = False

    def upload_block(self, db, table, block_id, batch, schema):
        self.upload_started.set()
        assert self.gate.wait(10), "gate never released"
        if self.fail:
            raise OSError("injected sink failure")
        self.uploads += 1
        return super().upload_block(db, table, block_id, batch, schema)


def _make_batch(table, ts_start=0, n=10):
    d_et = table.dictionary("example_type")
    d_l = table.dictionary("labels")
    d_st = table.dictionary("stacktrace")
    et, etv = d_et.encode(["cpu"] * n)
    lc, lv = d_l.encode([f"g{i % 3}" for i in range(n)])
    st, stv = d_st.encode(["stack"] * n)
    return ColumnBatch(
        [
            Column("example_type", KIND_DICT, et, etv, d_et),
            Column("labels.label1", KIND_DICT, lc, lv, d_l),
            Column("stacktrace", KIND_DICT, st, stv, d_st),
            Column(
                "timestamp",
                KIND_INT64,
                np.arange(ts_start, ts_start + n, dtype=np.int64),
                np.ones(n, bool),
            ),
            Column(
                "value", KIND_INT64, np.ones(n, dtype=np.int64), np.ones(n, bool)
            ),
        ],
        n,
    )


def _query_sum(db, name="t"):
    out = []
    LocalEngine(db.table_provider()).scan_table(name).aggregate(
        [E.Sum(E.Col("value"))], []
    ).execute(out.append)
    return int(out[0].column("sum(value)").values[0]) if out else 0


def test_inserts_proceed_during_inflight_rotation(tmp_path):
    bucket = GatedBucket(str(tmp_path / "bucket"))
    store = ColumnStore(
        storage_path=str(tmp_path / "db"),
        enable_wal=True,
        sources=[bucket],
        sinks=[bucket],
    )
    db = store.db("test")
    table = db.table(
        "t", TableConfig(schema=sample_definition(), active_memory_size=1)
    )
    t0 = time.perf_counter()
    table.insert_record(_make_batch(table))  # triggers rotation
    insert_latency = time.perf_counter() - t0
    assert bucket.upload_started.wait(5), "rotation persist never started"
    # The inserter did NOT pay for the (gated) upload.
    assert insert_latency < 1.0
    # More inserts + queries proceed while the upload is stuck; the rotated
    # block stays readable from memory (pending_blocks).
    table.insert_record(_make_batch(table, ts_start=10))
    assert _query_sum(db) == 20
    assert bucket.uploads == 0  # still in flight
    bucket.gate.set()
    table.sync()
    assert bucket.uploads >= 1
    assert bucket.blocks("test", "t")
    assert _query_sum(db) == 20  # identical after persist completes
    store.close()

    # Recovery sees exactly the same data.
    store2 = ColumnStore(
        storage_path=str(tmp_path / "db"),
        enable_wal=True,
        sources=[bucket],
        sinks=[bucket],
    )
    assert _query_sum(store2.db("test")) == 20
    store2.close()


def test_rotation_failure_surfaces_on_next_insert(tmp_path):
    bucket = GatedBucket(str(tmp_path / "bucket"))
    bucket.fail = True
    bucket.gate.set()
    store = ColumnStore(
        storage_path=str(tmp_path / "db"),
        enable_wal=True,
        sources=[bucket],
        sinks=[bucket],
    )
    db = store.db("test")
    table = db.table(
        "t", TableConfig(schema=sample_definition(), active_memory_size=1)
    )
    table.insert_record(_make_batch(table))
    with pytest.raises(OSError, match="injected sink failure"):
        table.wait_for_rotations()
    # The failed block was NOT dropped: its rows stay readable from memory,
    # and persisted_tx must not advance past the stranded persist.
    assert _query_sum(db) == 10
    assert table.persisted_tx == 0
    # Once the sink heals, sync() retries the stranded job and it persists.
    bucket.fail = False
    table.sync()
    assert bucket.uploads >= 1
    assert _query_sum(db) == 10
    store.close()


def test_background_compaction_keeps_results_identical(tmp_path):
    from frostdb_tpu.table import DEFAULT_LEVELS

    old_size = DEFAULT_LEVELS[0].max_size
    DEFAULT_LEVELS[0].max_size = 1  # every insert exceeds L0
    try:
        store = ColumnStore(storage_path=str(tmp_path / "db"), enable_wal=True)
        db = store.db("test")
        table = db.table("t", TableConfig(schema=sample_definition()))
        assert table.active_block.index.background
        for i in range(8):
            table.insert_record(_make_batch(table, ts_start=i * 10))
        table.sync()
        assert _query_sum(db) == 80
        # compactions actually happened on the worker
        levels = table.active_block.index.levels
        assert sum(len(l) for l in levels[1:]) > 0
        store.close()
    finally:
        DEFAULT_LEVELS[0].max_size = old_size


def test_sync_mode_still_available(tmp_path):
    bucket = FileSystemBucket(str(tmp_path / "bucket"))
    store = ColumnStore(
        storage_path=str(tmp_path / "db"),
        enable_wal=True,
        sources=[bucket],
        sinks=[bucket],
        background_threads=False,
    )
    db = store.db("test")
    table = db.table(
        "t", TableConfig(schema=sample_definition(), active_memory_size=1)
    )
    table.insert_record(_make_batch(table))
    # Synchronous mode: the block is uploaded before insert returns.
    assert bucket.blocks("test", "t")
    assert _query_sum(db) == 10
    store.close()
