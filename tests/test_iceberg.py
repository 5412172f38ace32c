"""Iceberg DataSource/DataSink + the self-contained Avro codec
(reference: storage/iceberg.go; iceberg_test.go exercises upload+scan via
a DB with the Iceberg catalog as source and sink)."""

import json
import os

import numpy as np
import pytest

from frostdb_tpu import avro
from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.iceberg import IcebergCatalog
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.table import TableConfig

# ---------------------------------------------------------------------------
# Avro codec


NESTED_SCHEMA = {
    "type": "record",
    "name": "outer",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": ["null", "long"], "default": None},
        {"name": "f", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {
            "name": "inner",
            "type": {
                "type": "record",
                "name": "inner_rec",
                "fields": [
                    {"name": "k", "type": "int"},
                    {"name": "v", "type": "bytes"},
                ],
            },
        },
        {
            "name": "items",
            "type": {"type": "array", "items": "inner_rec"},
        },
        {"name": "tags", "type": {"type": "map", "values": "string"}},
        {
            "name": "color",
            "type": {
                "type": "enum",
                "name": "color_e",
                "symbols": ["RED", "GREEN"],
            },
        },
        {
            "name": "sync",
            "type": {"type": "fixed", "name": "sync_f", "size": 4},
        },
    ],
}


def _records():
    return [
        {
            "s": "héllo",
            "n": None,
            "f": 3.25,
            "flag": True,
            "raw": b"\x00\x01\xff",
            "inner": {"k": -1, "v": b"x"},
            "items": [{"k": 7, "v": b"a"}, {"k": -(2**40), "v": b""}],
            "tags": {"a": "1", "b": "2"},
            "color": "GREEN",
            "sync": b"abcd",
        },
        {
            "s": "",
            "n": 2**62,
            "f": -0.5,
            "flag": False,
            "raw": b"",
            "inner": {"k": 0, "v": b""},
            "items": [],
            "tags": {},
            "color": "RED",
            "sync": b"\x00\x00\x00\x00",
        },
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_container_roundtrip(codec):
    recs = _records()
    blob = avro.write_container(NESTED_SCHEMA, recs, codec=codec)
    meta, got = avro.read_container(blob)
    assert got == recs
    assert json.loads(meta["avro.schema"].decode()) == NESTED_SCHEMA


def test_avro_zigzag_edge_values():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    for v in (0, 1, -1, 63, -64, 2**31, -(2**31), 2**63 - 1, -(2**63)):
        blob = avro.write_container(schema, [{"x": v}], codec="null")
        _m, got = avro.read_container(blob)
        assert got == [{"x": v}], v


def test_avro_named_type_reference_and_union():
    # second field refers to the first record type by name
    schema = {
        "type": "record",
        "name": "top",
        "fields": [
            {
                "name": "a",
                "type": {
                    "type": "record",
                    "name": "kv",
                    "fields": [{"name": "k", "type": "int"}],
                },
            },
            {"name": "b", "type": ["null", "kv"], "default": None},
        ],
    }
    recs = [{"a": {"k": 1}, "b": {"k": 2}}, {"a": {"k": 3}, "b": None}]
    _m, got = avro.read_container(avro.write_container(schema, recs))
    assert got == recs


# ---------------------------------------------------------------------------
# Iceberg catalog


def _batch(table, ts_start=0, n=6, etype="a"):
    d = table.dictionary("example_type")
    et, etv = d.encode([etype] * n)
    return ColumnBatch(
        [
            Column("example_type", KIND_DICT, et, etv, d),
            Column(
                "timestamp",
                KIND_INT64,
                np.arange(ts_start, ts_start + n, dtype=np.int64),
                np.ones(n, dtype=bool),
            ),
            Column(
                "value",
                KIND_INT64,
                np.ones(n, dtype=np.int64),
                np.ones(n, dtype=bool),
            ),
        ],
        n,
    )


def _query_sum(db, filt=None):
    engine = LocalEngine(db.table_provider())
    q = engine.scan_table("t")
    if filt is not None:
        q = q.filter(filt)
    out = []
    q.aggregate(
        [E.Sum(E.Col("value"))], [E.Col("example_type")]
    ).execute(out.append)
    return sum(
        int(b.column("sum(value)").values[i])
        for b in out
        for i in range(b.num_rows)
    )


def test_iceberg_upload_scan_roundtrip(tmp_path):
    cat = IcebergCatalog(str(tmp_path / "warehouse"))
    store = ColumnStore(
        storage_path=str(tmp_path / "db"),
        enable_wal=True,
        sources=[cat],
        sinks=[cat],
    )
    db = store.db("test")
    table = db.table(
        "t", TableConfig(schema=sample_definition(), active_memory_size=1)
    )
    table.insert_record(_batch(table))  # rotates + uploads (on the worker)
    table.insert_record(_batch(table, ts_start=10))
    table.sync()
    assert cat.prefixes("test") == ["t"]
    assert _query_sum(db) == 12
    store.close()

    # The warehouse holds real Iceberg metadata.
    tdir = tmp_path / "warehouse" / "test" / "t"
    assert (tdir / "metadata" / "version-hint.text").exists()
    v = int((tdir / "metadata" / "version-hint.text").read_text())
    meta = json.loads((tdir / f"v{v}.metadata.json").read_text())
    assert meta["format-version"] == 1
    snap = [
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    ][0]
    _m, manifests = avro.read_container(
        open(snap["manifest-list"], "rb").read()
    )
    assert manifests and all(
        os.path.exists(m["manifest_path"]) for m in manifests
    )

    # A fresh store reads the table back through the source.
    store2 = ColumnStore(
        storage_path=str(tmp_path / "db"),
        enable_wal=True,
        sources=[cat],
        sinks=[cat],
    )
    db2 = store2.db("test")
    assert _query_sum(db2) == 12
    store2.close()


def test_iceberg_bound_pruning(tmp_path):
    """Manifest-entry bounds prune data files before any parquet read
    (iceberg.go manifestEntryMayContainUsefulData)."""
    cat = IcebergCatalog(str(tmp_path / "w"))
    store = ColumnStore(storage_path=str(tmp_path / "db"))
    db = store.db("test")
    table = db.table("t", TableConfig(schema=sample_definition()))
    # two data files with disjoint timestamp ranges
    cat.upload_block("test", "t", "blk-low", _batch(table, ts_start=0), table._schema)
    cat.upload_block(
        "test", "t", "blk-high", _batch(table, ts_start=1000), table._schema
    )

    d = table.dictionary  # bound method used as get_dictionary
    full = cat.scan("test", "t", table._schema, None, d)
    assert sum(b.num_rows for b in full) == 12

    filt = E.Col("timestamp").gt_eq(500)
    pruned = cat.scan("test", "t", table._schema, filt, d)
    # only the high file survives the file-level bound test
    assert sum(b.num_rows for b in pruned) == 6
    assert all(
        int(np.min(b.column("timestamp").values)) >= 1000 for b in pruned
    )

    # exclusion by block id (in-memory blocks shadow persisted ones)
    excl = cat.scan("test", "t", table._schema, None, d, {"blk-high"})
    assert sum(b.num_rows for b in excl) == 6
    store.close()


def test_iceberg_maintenance_expires_snapshots(tmp_path):
    cat = IcebergCatalog(str(tmp_path / "w"))
    store = ColumnStore(storage_path=str(tmp_path / "db"))
    db = store.db("test")
    table = db.table("t", TableConfig(schema=sample_definition()))
    for i in range(6):
        cat.upload_block(
            "test", "t", f"b{i}", _batch(table, ts_start=i * 10), table._schema
        )
    removed = cat.maintenance("test", "t", keep_snapshots=2)
    assert removed > 0
    # current snapshot still reads ALL data files (append semantics carry
    # every file forward in the newest manifest list)
    got = cat.scan("test", "t", table._schema, None, table.dictionary)
    assert sum(b.num_rows for b in got) == 36
    store.close()


def test_iceberg_maintenance_removes_orphaned_data_files(tmp_path):
    """Data files referenced by no surviving manifest (e.g. a crashed
    upload that never committed its snapshot) are orphan-cleaned once past
    the age guard; live files survive (iceberg.go:133
    DefaultOrphanedFileAge)."""
    cat = IcebergCatalog(str(tmp_path / "w"))
    store = ColumnStore(storage_path=str(tmp_path / "db"))
    db = store.db("test")
    table = db.table("t", TableConfig(schema=sample_definition()))
    for i in range(6):
        cat.upload_block(
            "test", "t", f"b{i}", _batch(table, ts_start=i * 10), table._schema
        )
    ddir = tmp_path / "w" / "test" / "t" / "data"
    orphan = ddir / "crashed-upload.parquet"
    orphan.write_bytes(b"not a real parquet")
    fresh_orphan = ddir / "inflight-upload.parquet"
    fresh_orphan.write_bytes(b"also not parquet")
    old = 0  # epoch: far past any age guard
    os.utime(orphan, (old, old))

    removed = cat.maintenance("test", "t", keep_snapshots=2)
    assert removed > 0
    assert not orphan.exists()  # aged orphan removed
    assert fresh_orphan.exists()  # age guard protects in-flight uploads
    # every committed data file still present and readable
    got = cat.scan("test", "t", table._schema, None, table.dictionary)
    assert sum(b.num_rows for b in got) == 36
    store.close()


def test_iceberg_commit_conflict_detected(tmp_path):
    """Two writers racing on the same metadata version: the loser raises
    CommitConflictError instead of silently dropping the winner's commit."""
    from frostdb_tpu.iceberg import CommitConflictError

    cat = IcebergCatalog(str(tmp_path / "w"))
    store = ColumnStore(storage_path=str(tmp_path / "db"))
    db = store.db("test")
    table = db.table("t", TableConfig(schema=sample_definition()))
    cat.upload_block("test", "t", "b0", _batch(table), table._schema)
    tdir = tmp_path / "w" / "test" / "t"
    v = int((tdir / "metadata" / "version-hint.text").read_text())
    # simulate a concurrent winner: v+1 already exists on disk
    winner = (tdir / f"v{v + 1}.metadata.json")
    winner.write_text((tdir / f"v{v}.metadata.json").read_text())
    with pytest.raises(CommitConflictError):
        cat.upload_block("test", "t", "b1", _batch(table), table._schema)
    # winner's metadata untouched; hint still at v
    assert int((tdir / "metadata" / "version-hint.text").read_text()) == v
    store.close()
