"""Compiled serving layer: results must match the generic engine exactly."""

import numpy as np
import pytest

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.compiled import NotCompilable, compile_filter_aggregate
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.table import TableConfig


def _setup(n_parts=3, rows=4000, seed=1):
    store = ColumnStore()
    db = store.db("c")
    table = db.table("t", TableConfig(schema=sample_definition()))
    rng = np.random.default_rng(seed)
    d_et = table.dictionary("example_type")
    d_l = table.dictionary("labels")
    d_st = table.dictionary("stacktrace")
    for _p in range(n_parts):
        n = rows
        et, etv = d_et.encode(
            [f"type{int(x)}" for x in rng.integers(0, 7, n)]
        )
        st, stv = d_st.encode(["s"] * n)
        batch = ColumnBatch(
            [
                Column("example_type", KIND_DICT, et, etv, d_et),
                Column("stacktrace", KIND_DICT, st, stv, d_st),
                Column(
                    "timestamp",
                    KIND_INT64,
                    rng.integers(0, 100, n).astype(np.int64),
                    np.ones(n, dtype=bool),
                ),
                Column(
                    "value",
                    KIND_INT64,
                    rng.integers(0, 100000, n).astype(np.int64),
                    np.ones(n, dtype=bool),
                ),
            ],
            n,
        )
        table.insert_record(batch, sort=True)
    return store, db, table


def _engine_result(db, filter_expr):
    engine = LocalEngine(db.table_provider())
    q = engine.scan_table("t")
    if filter_expr is not None:
        q = q.filter(filter_expr)
    out = []
    q.aggregate(
        [E.Sum(E.Col("value")), E.Count(E.Col("value"))],
        [E.Col("example_type")],
    ).execute(out.append)
    res = {}
    for b in out:
        for i in range(b.num_rows):
            res[b.column("example_type").py_value(i)] = (
                int(b.column("sum(value)").values[i]),
                int(b.column("count(value)").values[i]),
            )
    return res


def test_compiled_matches_engine_filtered():
    _s, db, table = _setup()
    q = compile_filter_aggregate(
        table,
        "example_type",
        [("sum", "value"), ("count", "value")],
        filter=("timestamp", ">=", 50),
    )
    got_batch = q.execute()
    got = {
        got_batch.column("example_type").py_value(i): (
            int(got_batch.column("sum(value)").values[i]),
            int(got_batch.column("count(value)").values[i]),
        )
        for i in range(got_batch.num_rows)
    }
    expect = _engine_result(db, E.Col("timestamp").gt_eq(50))
    assert got == expect


def test_compiled_matches_engine_unfiltered():
    _s, db, table = _setup(seed=9)
    q = compile_filter_aggregate(
        table, "example_type", [("sum", "value"), ("count", "value")]
    )
    got_batch = q.execute()
    got = {
        got_batch.column("example_type").py_value(i): (
            int(got_batch.column("sum(value)").values[i]),
            int(got_batch.column("count(value)").values[i]),
        )
        for i in range(got_batch.num_rows)
    }
    expect = _engine_result(db, None)
    assert got == expect


def test_not_compilable_patterns():
    _s, _db, table = _setup(n_parts=1, rows=100)
    with pytest.raises(NotCompilable):
        compile_filter_aggregate(table, "timestamp", [("sum", "value")])
    with pytest.raises(NotCompilable):
        compile_filter_aggregate(table, "example_type", [("min", "value")])
