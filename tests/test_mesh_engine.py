"""Mesh-integrated engine (VERDICT item 1): the SAME
scan_table(...).filter(...).aggregate(...) query must return byte-identical
results on the single-stream engine, a 1-device mesh, and an 8-virtual-device
mesh."""

import numpy as np
import pytest

import jax

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.parallel.mesh import make_mesh
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.query.physical import ExecOptions
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.table import TableConfig


def _setup(n_parts=4, rows=700, n_groups=23, seed=0, ns_ts=False):
    store = ColumnStore()
    db = store.db("test")
    table = db.table("t", TableConfig(schema=sample_definition()))
    rng = np.random.default_rng(seed)
    for p in range(n_parts):
        n = rows + p * 31
        d_et = table.dictionary("example_type")
        d_l = table.dictionary("labels")
        d_st = table.dictionary("stacktrace")
        et, etv = d_et.encode(
            rng.choice(["cpu", "mem", "io"], n).tolist()
        )
        lc, lv = d_l.encode([f"g{int(x)}" for x in rng.integers(0, n_groups, n)])
        st, stv = d_st.encode(["stack"] * n)
        cols = [
            Column("example_type", KIND_DICT, et, etv, d_et),
            Column("labels.label1", KIND_DICT, lc, lv, d_l),
            Column("stacktrace", KIND_DICT, st, stv, d_st),
            Column(
                "timestamp",
                KIND_INT64,
                rng.integers(0, 10**15 if ns_ts else 1000, n).astype(
                    np.int64
                ),
                np.ones(n, bool),
            ),
            Column(
                "value",
                KIND_INT64,
                rng.integers(-500, 500, n).astype(np.int64),
                np.ones(n, bool),
            ),
        ]
        if p != 1:
            # one part LACKS the job column: missing-dynamic-column
            # semantics must resolve statically per part on the mesh too
            jc, jv = d_l.encode(
                rng.choice(["api", "web", ""], n).tolist()
            )
            cols.insert(2, Column("labels.job", KIND_DICT, jc, jv, d_l))
        table.insert_record(ColumnBatch(cols, n))
    return store, db, table


def _rows(batch):
    out = []
    for i in range(batch.num_rows):
        row = []
        for c in batch.columns:
            if c.dictionary is not None:
                row.append((c.name, c.dictionary.values[int(c.values[i])]))
            else:
                v = c.values[i]
                row.append((c.name, int(v) if c.validity[i] else None))
        out.append(tuple(row))
    return out


def _run(db, opts, q_fn):
    engine = LocalEngine(db.table_provider(), opts)
    out = []
    q_fn(engine.scan_table("t")).execute(out.append)
    assert len(out) <= 1
    return _rows(out[0]) if out else []


_AGGS = [E.Sum(E.Col("value")), E.Count(E.Col("value"))]

QUERIES = {
    "sum": lambda q: q.aggregate(
        [E.Sum(E.Col("value"))], [E.Col("labels.label1")]
    ),
    "multi-agg": lambda q: q.aggregate(
        [
            E.Sum(E.Col("value")),
            E.Count(E.Col("value")),
            E.Min(E.Col("value")),
            E.Max(E.Col("value")),
        ],
        [E.Col("labels.label1")],
    ),
    "filtered": lambda q: q.filter(E.Col("timestamp").gt_eq(500)).aggregate(
        _AGGS, [E.Col("labels.label1")]
    ),
    "two-value-cols": lambda q: q.aggregate(
        [E.Sum(E.Col("value")), E.Max(E.Col("timestamp"))],
        [E.Col("labels.label1")],
    ),
    "avg": lambda q: q.aggregate(
        [E.Avg(E.Col("value"))], [E.Col("labels.label1")]
    ),
    # --- the round-3 envelope: the Parca-shaped query corpus (VERDICT
    # item 1) — dict/string predicates, AND conjunctions, missing dynamic
    # columns, null literals — must distribute, byte-identically.
    "dict-eq": lambda q: q.filter(E.Col("labels.job").eq("api")).aggregate(
        _AGGS, [E.Col("labels.label1")]
    ),
    "parca-shape": lambda q: q.filter(
        E.And(
            E.Col("labels.job").eq("api"), E.Col("timestamp").gt_eq(500)
        )
    ).aggregate(_AGGS, [E.Col("example_type")]),
    "conj3": lambda q: q.filter(
        E.And(
            E.And(
                E.Col("timestamp").gt(100), E.Col("timestamp").lt_eq(900)
            ),
            E.Col("labels.job").not_eq("web"),
        )
    ).aggregate(_AGGS, [E.Col("labels.label1")]),
    "regex": lambda q: q.filter(
        E.Col("labels.job").regex_match("^a")
    ).aggregate(_AGGS, [E.Col("example_type")]),
    "null-lit": lambda q: q.filter(E.Col("labels.job").eq(None)).aggregate(
        _AGGS, [E.Col("labels.label1")]
    ),
    "missing-col-ne": lambda q: q.filter(
        E.Col("labels.zone").not_eq("x")
    ).aggregate(_AGGS, [E.Col("labels.label1")]),
    "contains": lambda q: q.filter(
        E.Col("labels.job").contains("p")
    ).aggregate(_AGGS, [E.Col("labels.label1")]),
}


@pytest.mark.parametrize("qname", sorted(QUERIES))
def test_mesh_engine_bit_identical(qname):
    store, db, table = _setup()
    q = QUERIES[qname]
    generic = _run(db, ExecOptions(compiled_serving=False), q)
    compiled = _run(db, ExecOptions(compiled_serving=True), q)
    mesh1 = _run(db, ExecOptions(mesh=make_mesh(1)), q)
    mesh8 = _run(db, ExecOptions(mesh=make_mesh(8)), q)
    assert generic, "query returned nothing"
    assert compiled == generic
    assert mesh1 == generic
    assert mesh8 == generic


def test_mesh_engine_wide_spans_distribute():
    """Nanosecond-magnitude timestamps: max(timestamp) and sums over >32-bit
    spans reduce natively in int64 on the mesh (no digit envelope)."""
    store, db, table = _setup(ns_ts=True)
    q = lambda b: b.filter(E.Col("timestamp").gt(5 * 10**14)).aggregate(
        [
            E.Max(E.Col("timestamp")),
            E.Min(E.Col("timestamp")),
            E.Sum(E.Col("timestamp")),
        ],
        [E.Col("labels.label1")],
    )
    generic = _run(db, ExecOptions(compiled_serving=False), q)
    mesh8 = _run(db, ExecOptions(mesh=make_mesh(8)), q)
    assert generic and mesh8 == generic


def test_mesh_engine_ordered_aggregations():
    """Grouping by the primary sorting column with ordered_aggregations
    plans OrderedAggregate (key-order emission); the mesh path must mirror
    that choice exactly (physical._should_plan_ordered)."""
    store = ColumnStore()
    db = store.db("test")
    table = db.table("t", TableConfig(schema=sample_definition()))
    rng = np.random.default_rng(5)
    for _ in range(3):
        n = 200
        d_et = table.dictionary("example_type")
        d_l = table.dictionary("labels")
        d_st = table.dictionary("stacktrace")
        ets = sorted(f"type{int(x)}" for x in rng.integers(0, 9, n))
        et, etv = d_et.encode(ets)
        lc, lv = d_l.encode(["x"] * n)
        st, stv = d_st.encode(["stack"] * n)
        table.insert_record(
            ColumnBatch(
                [
                    Column("example_type", KIND_DICT, et, etv, d_et),
                    Column("labels.label1", KIND_DICT, lc, lv, d_l),
                    Column("stacktrace", KIND_DICT, st, stv, d_st),
                    Column("timestamp", KIND_INT64, np.arange(n, dtype=np.int64), np.ones(n, bool)),
                    Column("value", KIND_INT64, rng.integers(0, 100, n).astype(np.int64), np.ones(n, bool)),
                ],
                n,
            )
        )
    q = lambda b: b.aggregate([E.Sum(E.Col("value"))], [E.Col("example_type")])
    generic = _run(
        db,
        ExecOptions(compiled_serving=False, ordered_aggregations=True),
        q,
    )
    mesh8 = _run(
        db, ExecOptions(mesh=make_mesh(8), ordered_aggregations=True), q
    )
    assert mesh8 == generic
    keys = [r[0][1] for r in generic]
    assert keys == sorted(keys) and len(keys) == 9


def test_mesh_large_code_space_sorted_reduce():
    """K past the sorted-reduction threshold distributes too: the per-shard
    sort + prefix-sum reduction runs inside shard_map, psum-combined —
    byte-identical to the generic engine."""
    store, db, table = _setup(n_parts=2, rows=9000, n_groups=6000)
    q = lambda b: b.filter(E.Col("timestamp").gt(100)).aggregate(
        [
            E.Sum(E.Col("value")),
            E.Count(E.Col("value")),
            E.Min(E.Col("value")),
            E.Max(E.Col("value")),
        ],
        [E.Col("labels.label1")],
    )
    generic = _run(db, ExecOptions(compiled_serving=False), q)
    mesh8 = _run(db, ExecOptions(mesh=make_mesh(8)), q)
    assert len(generic) > 4096
    assert mesh8 == generic


def test_mesh_engine_falls_back_on_unsupported():
    """Distinct queries don't match the fast shape; the mesh engine must
    fall back to the generic DAG and still answer."""
    store, db, table = _setup(n_parts=1, rows=100)
    opts = ExecOptions(mesh=make_mesh(8))
    engine = LocalEngine(db.table_provider(), opts)
    out = []
    engine.scan_table("t").distinct(E.Col("labels.label1")).execute(out.append)
    assert out and out[0].num_rows > 0


def test_mesh_scan_is_incremental():
    """The mesh scan uploads per part, once (VERDICT item 4): a repeat query
    uploads ZERO bytes, and an insert between two queries uploads only the
    new part's columns — never the whole table (the reference's incremental
    per-part Scan, index/lsm.go:401)."""
    from frostdb_tpu.device import SHARDED_UPLOAD_STATS

    store, db, table = _setup(n_parts=2, rows=200)
    opts = ExecOptions(mesh=make_mesh(8))
    q = QUERIES["multi-agg"]
    r1 = _run(db, opts, q)
    first_cols = SHARDED_UPLOAD_STATS["columns"]
    assert first_cols > 0
    r2 = _run(db, opts, q)
    assert r1 == r2
    assert SHARDED_UPLOAD_STATS["columns"] == first_cols  # fully cached
    # an insert adds one part -> only ITS columns upload
    n = 50
    d_et = table.dictionary("example_type")
    d_l = table.dictionary("labels")
    d_st = table.dictionary("stacktrace")
    et, etv = d_et.encode(["cpu"] * n)
    lc, lv = d_l.encode(["gnew"] * n)
    st, stv = d_st.encode(["stack"] * n)
    table.insert_record(
        ColumnBatch(
            [
                Column("example_type", KIND_DICT, et, etv, d_et),
                Column("labels.label1", KIND_DICT, lc, lv, d_l),
                Column("stacktrace", KIND_DICT, st, stv, d_st),
                Column("timestamp", KIND_INT64, np.arange(n, dtype=np.int64), np.ones(n, bool)),
                Column("value", KIND_INT64, np.ones(n, dtype=np.int64), np.ones(n, bool)),
            ],
            n,
        )
    )
    before = SHARDED_UPLOAD_STATS["bytes"]
    r3 = _run(db, opts, q)
    uploaded = SHARDED_UPLOAD_STATS["bytes"] - before
    # the query touches 2 columns of the new part (labels.label1 + value);
    # each pads to one ROW_TILE per shard (8 shards x 1024 rows)
    per_col = 8 * 1024 * (8 + 1)  # int64/int32<=8B data + 1B validity
    assert 0 < uploaded <= 2 * per_col + 64
    assert any(("labels.label1", "gnew") in r for r in r3)
    generic = _run(db, ExecOptions(compiled_serving=False), q)
    assert r3 == generic
