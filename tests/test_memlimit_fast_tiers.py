"""Memory-limited queries on the fast tiers (VERDICT r4 weak #3; reference
query/memory.go:17 LimitAllocator): a limited engine must still serve from
the compiled/dense/mesh/scan tiers when its per-query transients fit the
budget, and raise MemoryLimitExceeded — not silently fall back — when they
don't."""

import numpy as np
import pytest

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.memorylimit import LimitAllocator, MemoryLimitExceeded
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.query.physical import ExecOptions
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.table import TableConfig


def build_db(n=20_000):
    store = ColumnStore()
    db = store.db("d")
    table = db.table("t", TableConfig(schema=sample_definition()))
    d_l = table.dictionary("labels")
    rng = np.random.default_rng(0)
    lc, lv = d_l.encode([f"g{int(i)}" for i in rng.integers(0, 16, n)])
    table.insert_record(
        ColumnBatch(
            [
                Column("labels.label1", KIND_DICT, lc, lv, d_l),
                Column(
                    "timestamp",
                    KIND_INT64,
                    rng.integers(0, 1000, n).astype(np.int64),
                    np.ones(n, bool),
                ),
                Column(
                    "value",
                    KIND_INT64,
                    rng.integers(0, 100, n).astype(np.int64),
                    np.ones(n, bool),
                ),
            ],
            n,
        ),
        sort=True,
    )
    table.sync()
    return store, db


def rows(bs):
    return [
        tuple((c.name, c.py_value(i)) for c in b.columns)
        for b in bs
        for i in range(b.num_rows)
    ]


def agg_q(e):
    return (
        e.scan_table("t")
        .filter(E.Col("timestamp").gt_eq(100))
        .aggregate(
            [E.Sum(E.Col("value")), E.Count(E.Col("value"))],
            [E.Col("labels.label1")],
        )
    )


def scan_q(e):
    return (
        e.scan_table("t")
        .filter(E.Col("timestamp").lt(20))
        .project(E.Col("labels.label1"), E.Col("value"))
    )


def test_limited_query_serves_compiled():
    store, db = build_db()
    alloc = LimitAllocator(64 << 20)
    engine = LocalEngine(db.table_provider(), allocator=alloc)
    unlimited = LocalEngine(db.table_provider())
    a, b = [], []
    agg_q(engine).execute(a.append)
    agg_q(unlimited).execute(b.append)
    assert engine.last_serving_path == "compiled", (
        engine.last_serving_path,
        engine.last_fallback_reasons,
    )
    assert rows(a) == rows(b)
    # transient accounting is released after the query
    assert alloc.allocated() == 0


def test_limited_query_over_budget_raises():
    store, db = build_db()
    engine = LocalEngine(db.table_provider(), allocator=LimitAllocator(64))
    with pytest.raises(MemoryLimitExceeded):
        agg_q(engine).execute(lambda b: None)


def test_limited_scan_serves_and_raises():
    store, db = build_db()
    alloc = LimitAllocator(64 << 20)
    engine = LocalEngine(db.table_provider(), allocator=alloc)
    unlimited = LocalEngine(db.table_provider())
    a, b = [], []
    scan_q(engine).execute(a.append)
    scan_q(unlimited).execute(b.append)
    assert engine.last_serving_path == "compiled_scan", (
        engine.last_serving_path,
        engine.last_fallback_reasons,
    )
    assert rows(a) == rows(b)
    assert alloc.allocated() == 0

    tight = LocalEngine(db.table_provider(), allocator=LimitAllocator(64))
    with pytest.raises(MemoryLimitExceeded):
        scan_q(tight).execute(lambda b: None)


def test_limited_mesh_serves():
    from frostdb_tpu.parallel.mesh import make_mesh

    store, db = build_db()
    engine = LocalEngine(
        db.table_provider(),
        ExecOptions(mesh=make_mesh(8)),
        allocator=LimitAllocator(64 << 20),
    )
    unlimited = LocalEngine(db.table_provider())
    a, b = [], []
    agg_q(engine).execute(a.append)
    agg_q(unlimited).execute(b.append)
    assert engine.last_serving_path == "mesh", (
        engine.last_serving_path,
        engine.last_fallback_reasons,
    )
    assert rows(a) == rows(b)


def test_limited_scan_with_limit_releases_everything():
    # regression (round-5 review): the limit slice used to shrink idx
    # before the free, leaking (N-n)*8 bytes per query
    store, db = build_db()
    alloc = LimitAllocator(64 << 20)
    engine = LocalEngine(db.table_provider(), allocator=alloc)
    for _ in range(3):
        out = []
        engine.scan_table("t").filter(E.Col("timestamp").lt(500)).project(
            E.Col("value")
        ).limit(E.Literal(5)).execute(out.append)
        assert sum(b.num_rows for b in out) == 5
    assert engine.last_serving_path == "compiled_scan"
    assert alloc.allocated() == 0
