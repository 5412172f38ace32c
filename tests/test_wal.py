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


def test_wal_unknown_format_refuses_instead_of_truncating(tmp_path):
    """A segment written by another framing version (bad magic at offset 0)
    must raise, NOT self-repair into an empty file (round-1 advisor
    finding: the JSON->binary upgrade would have silently zeroed every
    segment)."""
    from frostdb_tpu.wal import WALUnknownFormatError

    path = tmp_path / "00000000000000000001.wal"
    legacy = b'{"tx": 1, "kind": "write"}' + b"x" * 100
    path.write_bytes(legacy)
    w = FileWAL(str(tmp_path))
    with pytest.raises(WALUnknownFormatError):
        w.replay(lambda h, b: None)
    # file bytes untouched
    assert path.read_bytes() == legacy
    w.close()


def test_wal_mid_segment_corruption_truncates_and_counts(tmp_path):
    table = _table()
    w = FileWAL(str(tmp_path))
    for tx in (1, 2, 3):
        w.log_record(tx, "t", _make_batch(table))
    w.close()
    seg = os.path.join(str(tmp_path), sorted(os.listdir(str(tmp_path)))[0])
    data = open(seg, "rb").read()
    # corrupt the magic of the 3rd frame: find frame boundaries by replaying
    w = FileWAL(str(tmp_path))
    offsets = []
    pos = [0]

    def h(hdr, body):
        offsets.append(pos[0])

    w.replay(h, from_tx=0, repair=False)
    # recompute frame offsets from sizes
    from frostdb_tpu.wal import _CRC, _PREFIX

    off, bounds = 0, []
    while off < len(data):
        _m, _k, tlen, blen, bl, _tx = _PREFIX.unpack_from(data, off)
        bounds.append(off)
        off += _PREFIX.size + _CRC.size + tlen + blen + bl
    assert len(bounds) == 3
    corrupted = bytearray(data)
    corrupted[bounds[2]] = 0x00  # bad magic mid-segment
    open(seg, "wb").write(bytes(corrupted))

    w2 = FileWAL(str(tmp_path))
    seen = []
    w2.replay(lambda h, b: seen.append(h["tx"]), from_tx=0)
    assert seen == [1, 2]
    assert w2.repairs == 1 and w2.repairs_lost_records == 1
    assert os.path.getsize(seg) == bounds[2]  # tail truncated
    w2.close()


def test_wal_repairs_surface_in_metrics_registry(tmp_path):
    """FileWAL repairs must bump the store-wide registry counter so they
    are visible in expose() (reference: repairs_total, wal/wal.go:216) —
    round-2 advisor: the counter was defined but never incremented."""
    from frostdb_tpu.metrics import MetricsRegistry

    table = _table()
    w = FileWAL(str(tmp_path / "wal"))
    w.log_record(1, "t", _make_batch(table))
    w.log_record(2, "t", _make_batch(table))
    w.close()
    seg_dir = tmp_path / "wal"
    seg = os.path.join(str(seg_dir), sorted(os.listdir(str(seg_dir)))[0])
    # flip the final payload byte: the tail frame parses but fails its CRC
    with open(seg, "r+b") as f:
        f.seek(-1, os.SEEK_END)
        last = f.read(1)
        f.seek(-1, os.SEEK_END)
        f.write(bytes([last[0] ^ 0xFF]))

    reg = MetricsRegistry()
    w2 = FileWAL(str(seg_dir), repair_counter=reg.wal_repairs)
    w2.replay(lambda h, b: None, from_tx=0)
    w2.close()
    assert w2.repairs == 1
    assert reg.wal_repairs.value() == 1
    assert "frostdb_tpu_wal_repairs_total 1" in reg.expose()


def test_db_recovery_repair_visible_in_expose(tmp_path):
    """End-to-end: a torn WAL tail repaired during ColumnStore recovery
    shows up in the store metrics exposition."""
    from frostdb_tpu.db import ColumnStore
    from frostdb_tpu.schema import sample_definition
    from frostdb_tpu.table import TableConfig

    store = ColumnStore(storage_path=str(tmp_path), enable_wal=True)
    db = store.db("m")
    t = db.table("t", TableConfig(schema=sample_definition()))
    t.insert_record(_make_batch(t))
    t.insert_record(_make_batch(t))
    store.close()
    wal_dir = tmp_path / "databases" / "m" / "wal"
    seg = sorted(os.listdir(str(wal_dir)))[0]
    with open(os.path.join(str(wal_dir), seg), "r+b") as f:
        f.seek(-1, os.SEEK_END)
        last = f.read(1)
        f.seek(-1, os.SEEK_END)
        f.write(bytes([last[0] ^ 0xFF]))

    store2 = ColumnStore(storage_path=str(tmp_path), enable_wal=True)
    store2.db("m")
    assert store2.metrics.wal_repairs.value() >= 1
    assert "frostdb_tpu_wal_repairs_total" in store2.metrics.expose()
    store2.close()


def test_wal_unknown_kind_crc_valid_is_skipped(tmp_path):
    """A CRC-valid frame with an unrecognized kind code (newer writer) is
    skipped; later frames still replay and nothing is truncated."""
    import struct
    import zlib

    from frostdb_tpu.wal import _CRC, _PREFIX, _MAGIC

    table = _table()
    w = FileWAL(str(tmp_path))
    w.log_record(1, "t", _make_batch(table))
    w.close()
    seg = os.path.join(str(tmp_path), sorted(os.listdir(str(tmp_path)))[0])
    # append an unknown-kind frame then a valid snapshot frame
    body = b"future-entry"
    prefix = _PREFIX.pack(_MAGIC, 99, 0, 0, len(body), 2)
    crc = zlib.crc32(prefix + body) & 0xFFFFFFFF
    with open(seg, "ab") as f:
        f.write(prefix + _CRC.pack(crc) + body)
    w2 = FileWAL(str(tmp_path))
    w2.log_snapshot(3)
    size_before = os.path.getsize(seg)
    seen = []
    w2.replay(lambda h, b: seen.append((h["tx"], h["kind"])), from_tx=0)
    assert [tx for tx, _ in seen] == [1, 3]
    assert w2.repairs == 0 and w2.repairs_lost_records == 0
    assert os.path.getsize(seg) == size_before
    w2.close()


def test_wal_replay_no_repair_leaves_tail(tmp_path):
    table = _table()
    w = FileWAL(str(tmp_path))
    w.log_record(1, "t", _make_batch(table))
    w.close()
    seg = os.path.join(str(tmp_path), sorted(os.listdir(str(tmp_path)))[0])
    with open(seg, "ab") as f:
        f.write(b"\xf5torn-partial-frame")
    size = os.path.getsize(seg)
    w2 = FileWAL(str(tmp_path))
    seen = []
    w2.replay(lambda h, b: seen.append(h["tx"]), from_tx=0, repair=False)
    assert seen == [1]
    assert os.path.getsize(seg) == size  # untouched in read-only mode
    w2.close()


def test_wal_reset(tmp_path):
    table = _table()
    w = FileWAL(str(tmp_path))
    w.log_record(1, "t", _make_batch(table))
    w.reset()
    assert os.listdir(str(tmp_path)) == []
    w.close()
