"""Persisted blocks are cached as parts: repeat queries never re-read the
bucket, and the compiled serving path stays on after block rotation
(reference: the bucket block cache/dedup, store.go:123,143)."""

import numpy as np
import pytest

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.query.physical import ExecOptions
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.store import FileSystemBucket
from frostdb_tpu.table import TableConfig


def _batch(table, labels, values, ts_start=1):
    n = len(values)
    d_et = table.dictionary("example_type")
    d_labels = table.dictionary("labels")
    d_st = table.dictionary("stacktrace")
    et_codes, et_valid = d_et.encode(["cpu"] * n)
    l_codes, l_valid = d_labels.encode(labels)
    st_codes, st_valid = d_st.encode(["stack"] * n)
    return ColumnBatch(
        [
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
                np.asarray(values, dtype=np.int64),
                np.ones(n, dtype=bool),
            ),
        ],
        n,
    )


def _setup(tmp_path):
    bucket = FileSystemBucket(str(tmp_path / "bucket"))
    store = ColumnStore(sources=[bucket], sinks=[bucket])
    db = store.db("test")
    table = db.table("t", TableConfig(schema=sample_definition()))
    table.insert_record(_batch(table, ["a", "b", "a"], [1, 2, 3]))
    table.rotate_block()
    table.insert_record(_batch(table, ["b", "c"], [10, 20], ts_start=10))
    return store, db, table


def _run(db, compiled: bool, **filters):
    engine = LocalEngine(
        db.table_provider(), ExecOptions(compiled_serving=compiled)
    )
    q = engine.scan_table("t")
    if filters:
        q = q.filter(E.Col("timestamp").gt_eq(filters["ts"]))
    out = []
    q.aggregate([E.Sum(E.Col("value"))], [E.Col("labels.label1")]).execute(
        lambda b: out.append(b)
    )
    assert len(out) == 1
    b = out[0]
    keys = b.column("labels.label1")
    vals = b.column("sum(value)")
    return [
        (keys.dictionary.values[int(k)], int(v))
        for k, v in zip(keys.values, vals.values)
    ]


def test_query_spans_rotated_and_active(tmp_path):
    store, db, table = _setup(tmp_path)
    expect = [("a", 4), ("b", 12), ("c", 20)]
    got_generic = _run(db, compiled=False)
    got_compiled = _run(db, compiled=True)
    assert sorted(got_generic) == expect
    assert got_compiled == got_generic  # incl. emission order


def test_compiled_path_survives_rotation(tmp_path):
    """lower_plan must NOT raise NotCompilable just because the table has
    sources (VERDICT item 2)."""
    store, db, table = _setup(tmp_path)
    from frostdb_tpu.compiled import lower_plan
    from frostdb_tpu.query.logical import Builder

    plan = (
        Builder()
        .scan(db.table_provider(), "t")
        .aggregate([E.Sum(E.Col("value"))], [E.Col("labels.label1")])
        .build()
    )
    from frostdb_tpu.query.optimize import optimize

    compiled = lower_plan(optimize(plan), ExecOptions())
    out = compiled.execute()
    got = [
        (out.column("labels.label1").dictionary.values[int(k)], int(v))
        for k, v in zip(
            out.column("labels.label1").values,
            out.column("sum(value)").values,
        )
    ]
    assert sorted(got) == [("a", 4), ("b", 12), ("c", 20)]


def test_bucket_read_once(tmp_path, monkeypatch):
    """The regression VERDICT asks for: zero bucket re-reads on a repeated
    query (block bytes are read once and cached as parts)."""
    store, db, table = _setup(tmp_path)

    import frostdb_tpu.store as store_mod

    reads = {"n": 0}
    orig = store_mod.FileSystemBucket.read_block_parts

    def counting(self, ref, schema, get_dictionary):
        reads["n"] += 1
        return orig(self, ref, schema, get_dictionary)

    monkeypatch.setattr(store_mod.FileSystemBucket, "read_block_parts", counting)

    first = _run(db, compiled=False)
    after_first = reads["n"]
    assert after_first >= 0  # block was already cached by _setup's query-free path
    second = _run(db, compiled=False)
    third = _run(db, compiled=True)
    assert reads["n"] == after_first, "repeat queries re-read the bucket"
    assert first == second == third


def test_filter_query_after_rotation(tmp_path):
    store, db, table = _setup(tmp_path)
    got = _run(db, compiled=True, ts=10)
    assert sorted(got) == [("b", 10), ("c", 20)]
    assert got == _run(db, compiled=False, ts=10)


def test_source_parts_evict_deleted_blocks(tmp_path):
    import shutil

    store, db, table = _setup(tmp_path)
    _run(db, compiled=False)
    assert table._source_parts
    shutil.rmtree(str(tmp_path / "bucket" / "test" / "t"))
    got = _run(db, compiled=False)
    assert sorted(got) == [("b", 10), ("c", 20)]
    assert not table._source_parts


def test_read_only_bucket_table_discovery(tmp_path):
    """Write blocks with one store; a FRESH store over the same bucket (no
    create calls) discovers the table from block parquet metadata and serves
    queries read-only (reference: db.go:494-508 read-only tables,
    WithReadOnlyStorage db.go:180)."""
    store, db, table = _setup(tmp_path)
    table.rotate_block()  # persist the second batch too
    expected = _run(db, compiled=False)

    bucket2 = FileSystemBucket(str(tmp_path / "bucket"))
    store2 = ColumnStore(sources=[bucket2])
    db2 = store2.db("test")
    t2 = db2.get_table("t")
    assert t2 is not None and t2.read_only
    assert sorted(_run(db2, compiled=False)) == sorted(expected)
    # Compiled serving works over the discovered (device-cached) parts too.
    assert sorted(_run(db2, compiled=True)) == sorted(expected)

    from frostdb_tpu.table import ReadOnlyTableError

    with pytest.raises(ReadOnlyTableError):
        t2.insert_record(_batch(t2, ["z"], [1]))

    # An explicit db.table() call on an existing read-only name returns the
    # discovered table rather than shadowing it with an empty writable one.
    from frostdb_tpu.schema import sample_definition as _sd
    from frostdb_tpu.table import TableConfig as _TC

    assert db2.table("t", _TC(schema=_sd())) is t2
