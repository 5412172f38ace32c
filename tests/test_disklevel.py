"""On-disk index file tests (reference: index/levels.go FileCompaction,
design/index_files.md; snapshot hard-linking snapshot.go:730)."""

import os

import numpy as np

from frostdb_tpu.db import ColumnStore
from frostdb_tpu.disklevel import DiskLevel
from frostdb_tpu.lsm import Part
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.snapshot import write_snapshot
from frostdb_tpu.table import TableConfig
from tests.test_db import _make_batch, _query_sum


def test_disk_level_roundtrip(tmp_path):
    store = ColumnStore(storage_path=str(tmp_path))
    db = store.db("x")
    table = db.table("t", TableConfig(schema=sample_definition()))
    lvl = DiskLevel(str(tmp_path / "lvl"), 2)
    p1 = Part(_make_batch(table), tx=3, compaction_level=2)
    p2 = Part(_make_batch(table, ts_start=10), tx=5, compaction_level=2)
    lvl.write_part(p1)
    lvl.write_part(p2)
    lvl.rotate_file()
    lvl.write_part(Part(_make_batch(table, ts_start=20), tx=7, compaction_level=2))

    recovered = DiskLevel(str(tmp_path / "lvl"), 2).recover(table.dictionary)
    assert [p.tx for p in recovered] == [3, 5, 7]
    assert all(p.compaction_level == 2 for p in recovered)
    assert recovered[0].batch.num_rows == 3


def test_disk_level_torn_tail(tmp_path):
    store = ColumnStore(storage_path=str(tmp_path))
    db = store.db("x")
    table = db.table("t", TableConfig(schema=sample_definition()))
    lvl = DiskLevel(str(tmp_path / "lvl"), 2)
    lvl.write_part(Part(_make_batch(table), tx=3, compaction_level=2))
    lvl.close()
    # tear the file: append half a frame
    files = sorted(os.listdir(str(tmp_path / "lvl")))
    with open(os.path.join(str(tmp_path / "lvl"), files[0]), "ab") as f:
        f.write(b"torn-parquet-payload-without-size-frame"[:20])
    recovered = DiskLevel(str(tmp_path / "lvl"), 2).recover(table.dictionary)
    # torn tail dropped, intact frame survives
    assert [p.tx for p in recovered] == [3]


def test_compaction_spills_to_disk_and_snapshot_links(tmp_path):
    store = ColumnStore(storage_path=str(tmp_path), enable_wal=True)
    db = store.db("d")
    table = db.table("t", TableConfig(schema=sample_definition()))
    for i in range(4):
        table.insert_record(_make_batch(table, ts_start=i * 10))
    # force compaction down to the disk-backed final level
    table.active_block.index.compact_level(0)
    table.active_block.index.compact_level(1)
    disk_dir = os.path.join(
        table.index_dir(), table.active_block.id, "2"
    )
    assert os.path.isdir(disk_dir) and os.listdir(disk_dir), "no index files"

    tx = write_snapshot(db, db.snapshot_dir)
    from frostdb_tpu.snapshot import read_footer, snapshot_path

    footer = read_footer(snapshot_path(db.snapshot_dir, tx))
    link_dir = os.path.join(db.snapshot_dir, footer["index_dirname"], "t", "2")
    assert os.path.isdir(link_dir) and os.listdir(link_dir), "no linked files"
    # the snapshot file itself should be small: parts live in linked files
    assert _query_sum(db, "t") == 24
    store.close()

    store2 = ColumnStore(storage_path=str(tmp_path), enable_wal=True)
    db2 = store2.db("d")
    assert _query_sum(db2, "t") == 24
    # restart again to make sure relinked files don't double-count
    store2.close()
    store3 = ColumnStore(storage_path=str(tmp_path), enable_wal=True)
    db3 = store3.db("d")
    assert _query_sum(db3, "t") == 24
    store3.close()


def test_same_tx_resnapshot_eio_preserves_published(tmp_path):
    """ADVICE r3 (high): a failed snapshot attempt at a tx that already has
    a published snapshot must not mutate the published snapshot's index
    links — the old incarnation stays fully loadable."""
    from frostdb_tpu.faults import FaultInjector
    from frostdb_tpu.snapshot import (
        get_latest_valid_snapshot_txn,
        read_footer,
        snapshot_path,
    )

    store = ColumnStore(storage_path=str(tmp_path), enable_wal=True)
    db = store.db("d")
    table = db.table("t", TableConfig(schema=sample_definition()))
    for i in range(4):
        table.insert_record(_make_batch(table, ts_start=i * 10))
    table.active_block.index.compact_level(0)
    table.active_block.index.compact_level(1)

    tx = write_snapshot(db, db.snapshot_dir)
    footer1 = read_footer(snapshot_path(db.snapshot_dir, tx))
    dir1 = footer1["index_dirname"]
    linked1 = footer1["tables"][0]["index_files"]
    assert linked1, "expected hard-linked index files"

    # Re-attempt at the SAME tx with an injected snapshot EIO.
    db.store.fault_injector = FaultInjector(seed=1, p_snapshot=1.0)
    import pytest

    with pytest.raises(OSError):
        write_snapshot(db, db.snapshot_dir)
    db.store.fault_injector = None

    # Published snapshot untouched: same footer dir, all links present.
    assert get_latest_valid_snapshot_txn(db.snapshot_dir) == tx
    footer2 = read_footer(snapshot_path(db.snapshot_dir, tx))
    assert footer2["index_dirname"] == dir1
    for f in linked1:
        assert os.path.exists(
            os.path.join(db.snapshot_dir, dir1, "t", "2", f)
        ), f"linked index file {f} lost by failed re-attempt"
    store.close()

    store2 = ColumnStore(storage_path=str(tmp_path), enable_wal=True)
    assert _query_sum(store2.db("d"), "t") == 24
    store2.close()


def test_same_tx_resnapshot_success_swaps_incarnation(tmp_path):
    """A successful re-snapshot at the same tx publishes a fresh incarnation
    dir and removes the stale one (no duplicate-load of stale links)."""
    from frostdb_tpu.snapshot import read_footer, snapshot_path

    store = ColumnStore(storage_path=str(tmp_path), enable_wal=True)
    db = store.db("d")
    table = db.table("t", TableConfig(schema=sample_definition()))
    for i in range(4):
        table.insert_record(_make_batch(table, ts_start=i * 10))
    table.active_block.index.compact_level(0)
    table.active_block.index.compact_level(1)

    tx1 = write_snapshot(db, db.snapshot_dir)
    dir1 = read_footer(snapshot_path(db.snapshot_dir, tx1))["index_dirname"]
    tx2 = write_snapshot(db, db.snapshot_dir)
    assert tx2 == tx1  # watermark unchanged
    dir2 = read_footer(snapshot_path(db.snapshot_dir, tx2))["index_dirname"]
    assert dir2 != dir1
    assert not os.path.isdir(os.path.join(db.snapshot_dir, dir1))
    assert os.path.isdir(os.path.join(db.snapshot_dir, dir2))
    store.close()

    store2 = ColumnStore(storage_path=str(tmp_path), enable_wal=True)
    assert _query_sum(store2.db("d"), "t") == 24
    store2.close()
