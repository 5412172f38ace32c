"""WAL unit tests (reference: wal/wal_test.go:292): sync + async batcher
modes, truncation, reset, replay ordering."""

import os

import pytest

from frostdb_tpu.db import ColumnStore
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.table import TableConfig
from frostdb_tpu.wal import FileWAL
from tests.test_db import _make_batch


def _table():
    store = ColumnStore()
    db = store.db("w")
    return db.table("t", TableConfig(schema=sample_definition()))


def test_async_wal_batcher(tmp_path):
    table = _table()
    w = FileWAL(str(tmp_path), sync=False)
    for tx in range(1, 21):
        w.log_record(tx, "t", _make_batch(table), block_id="b1")
    w.flush()
    seen = []
    w.replay(lambda h, b: seen.append((h["tx"], h["kind"])), from_tx=0)
    assert [tx for tx, _ in seen] == list(range(1, 21))
    w.close()


def test_async_wal_close_drains(tmp_path):
    table = _table()
    w = FileWAL(str(tmp_path), sync=False)
    for tx in range(1, 6):
        w.log_record(tx, "t", _make_batch(table), block_id="b1")
    w.close()  # must drain the queue
    w2 = FileWAL(str(tmp_path))
    seen = []
    w2.replay(lambda h, b: seen.append(h["tx"]), from_tx=0)
    assert seen == [1, 2, 3, 4, 5]
    w2.close()


def test_wal_truncate_drops_whole_segments(tmp_path):
    table = _table()
    w = FileWAL(str(tmp_path))
    w.log_record(1, "t", _make_batch(table))
    w.close()
    w = FileWAL(str(tmp_path))
    w.log_record(2, "t", _make_batch(table))
    w.close()
    w = FileWAL(str(tmp_path))
    w.log_record(3, "t", _make_batch(table))
    segs = sorted(os.listdir(str(tmp_path)))
    assert len(segs) == 3
    w.truncate(3)  # segments entirely below tx 3 go away
    segs = sorted(os.listdir(str(tmp_path)))
    assert len(segs) == 1
    seen = []
    w.replay(lambda h, b: seen.append(h["tx"]), from_tx=0)
    assert seen == [3]
    w.close()


def test_wal_reset(tmp_path):
    table = _table()
    w = FileWAL(str(tmp_path))
    w.log_record(1, "t", _make_batch(table))
    w.reset()
    assert os.listdir(str(tmp_path)) == []
    w.close()
