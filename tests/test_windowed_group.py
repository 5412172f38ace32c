"""Windowed (DurationExpr / second()) and plain-int64 group keys on the
compiled + dense + mesh fast paths (VERDICT r3 item 1): the Parca Range
shape — filter(ts range) group by (second(ts), labels.x) — must compile,
distribute, and stay byte-identical to the generic engine, including group
emission order. Reference: query/logicalplan/expr.go:1072 DurationExpr,
sqlparse/visitor.go:332, query/physicalplan/project.go windowed Duration
second-alignment."""

import numpy as np
import pytest

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.parallel.mesh import make_mesh
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.query.physical import ExecOptions
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.table import TableConfig


def _setup(n_parts=3, rows=900, n_groups=11, seed=0, ts_lo=0, ts_hi=120_000):
    store = ColumnStore()
    db = store.db("w")
    table = db.table("t", TableConfig(schema=sample_definition()))
    rng = np.random.default_rng(seed)
    for _p in range(n_parts):
        n = rows
        d_et = table.dictionary("example_type")
        d_l = table.dictionary("labels")
        d_st = table.dictionary("stacktrace")
        et, etv = d_et.encode(rng.choice(["cpu", "mem", "io"], n).tolist())
        lc, lv = d_l.encode(
            [f"g{int(x)}" for x in rng.integers(0, n_groups, n)]
        )
        st, stv = d_st.encode(["stack"] * n)
        batch = ColumnBatch(
            [
                Column("example_type", KIND_DICT, et, etv, d_et),
                Column("labels.node", KIND_DICT, lc, lv, d_l),
                Column("stacktrace", KIND_DICT, st, stv, d_st),
                Column(
                    "timestamp",
                    KIND_INT64,
                    rng.integers(ts_lo, ts_hi, n).astype(np.int64),
                    np.ones(n, bool),
                ),
                Column(
                    "value",
                    KIND_INT64,
                    rng.integers(-500, 500, n).astype(np.int64),
                    np.ones(n, bool),
                ),
            ],
            n,
        )
        table.insert_record(batch)
    return store, db, table


def _rows(batches):
    out = []
    for b in batches:
        for i in range(b.num_rows):
            row = []
            for c in b.columns:
                if c.dictionary is not None:
                    row.append(
                        (c.name, c.dictionary.values[int(c.values[i])])
                    )
                else:
                    v = c.values[i]
                    row.append(
                        (c.name, c.py_value(i) if c.validity[i] else None)
                    )
            out.append(tuple(row))
    return out


def _run(db, opts, q_fn):
    engine = LocalEngine(db.table_provider(), opts)
    out = []
    q_fn(engine.scan_table("t")).execute(out.append)
    return _rows(out), engine.last_serving_path


QUERIES = {
    # The Parca Range query (bench_test.go:322's shape): ts-range filter +
    # (second(ts), label) group-by.
    "parca-range": lambda q: q.filter(
        E.And(
            E.Col("timestamp").gt_eq(20_000), E.Col("timestamp").lt(90_000)
        )
    ).aggregate(
        [E.Sum(E.Col("value"))], [E.Duration(1000), E.Col("labels.node")]
    ),
    "window-only": lambda q: q.aggregate(
        [E.Sum(E.Col("value")), E.Count(E.Col("value"))], [E.Duration(1000)]
    ),
    "window-multi-agg": lambda q: q.filter(
        E.Col("timestamp").lt(60_000)
    ).aggregate(
        [
            E.Sum(E.Col("value")),
            E.Min(E.Col("value")),
            E.Max(E.Col("value")),
            E.Count(E.Col("value")),
        ],
        [E.Duration(15_000)],
    ),
    "dict-then-window": lambda q: q.aggregate(
        [E.Sum(E.Col("value"))], [E.Col("example_type"), E.Duration(30_000)]
    ),
    "window-avg": lambda q: q.aggregate(
        [E.Avg(E.Col("value"))], [E.Duration(10_000)]
    ),
}


@pytest.mark.parametrize("qname", sorted(QUERIES))
def test_windowed_compiled_parity(qname):
    _s, db, _t = _setup()
    q_fn = QUERIES[qname]
    slow, slow_path = _run(
        db, ExecOptions(compiled_serving=False), q_fn
    )
    assert slow_path == "generic"
    fast, fast_path = _run(db, ExecOptions(), q_fn)
    assert fast_path in ("compiled", "dense"), fast_path
    assert fast == slow
    assert slow, "expected non-empty results"


@pytest.mark.parametrize("qname", sorted(QUERIES))
@pytest.mark.parametrize("n_dev", [1, 8])
def test_windowed_mesh_parity(qname, n_dev):
    _s, db, _t = _setup(seed=3)
    q_fn = QUERIES[qname]
    slow, _ = _run(db, ExecOptions(compiled_serving=False), q_fn)
    mesh = make_mesh(n_dev)
    fast, path = _run(db, ExecOptions(mesh=mesh), q_fn)
    assert path == "mesh", path
    assert fast == slow


def test_plain_int64_group_key():
    """Plain group-by on an int64 column (window=1)."""
    _s, db, _t = _setup(rows=600, ts_lo=0, ts_hi=50)  # small key space
    q_fn = lambda q: q.aggregate(
        [E.Sum(E.Col("value")), E.Count(E.Col("value"))],
        [E.Col("timestamp")],
    )
    slow, _ = _run(db, ExecOptions(compiled_serving=False), q_fn)
    fast, path = _run(db, ExecOptions(), q_fn)
    assert path in ("compiled", "dense"), path
    assert fast == slow
    mesh, mpath = _run(db, ExecOptions(mesh=make_mesh(8)), q_fn)
    assert mpath == "mesh"
    assert mesh == slow


def test_int64_and_dict_pair_key():
    _s, db, _t = _setup(rows=500, ts_lo=0, ts_hi=30)
    q_fn = lambda q: q.aggregate(
        [E.Sum(E.Col("value"))],
        [E.Col("timestamp"), E.Col("example_type")],
    )
    slow, _ = _run(db, ExecOptions(compiled_serving=False), q_fn)
    fast, path = _run(db, ExecOptions(), q_fn)
    assert path in ("compiled", "dense"), path
    assert fast == slow


def test_negative_timestamps_floor_division():
    """Window keys use floor division — negative timestamps must truncate
    toward -inf exactly like the generic engine's numpy ``//``."""
    _s, db, _t = _setup(rows=700, ts_lo=-50_000, ts_hi=50_000, seed=5)
    q_fn = lambda q: q.aggregate(
        [E.Sum(E.Col("value")), E.Count(E.Col("value"))], [E.Duration(7000)]
    )
    slow, _ = _run(db, ExecOptions(compiled_serving=False), q_fn)
    fast, path = _run(db, ExecOptions(), q_fn)
    assert path in ("compiled", "dense"), path
    assert fast == slow
    mesh, mpath = _run(db, ExecOptions(mesh=make_mesh(8)), q_fn)
    assert mpath == "mesh"
    assert mesh == slow
    # sanity: some negative window keys actually appear
    assert any(r[0][1] < 0 for r in slow)


def test_wide_range_falls_to_dense_then_generic():
    """A huge key space must not mis-serve: past the Pallas ceiling the
    dense tier takes over; past 2^20 the generic engine does (with the
    reason recorded)."""
    _s, db, _t = _setup(rows=400, ts_lo=0, ts_hi=10**6, seed=2)
    q_fn = lambda q: q.aggregate(
        [E.Sum(E.Col("value"))], [E.Col("timestamp")]
    )
    slow, _ = _run(db, ExecOptions(compiled_serving=False), q_fn)
    fast, path = _run(db, ExecOptions(), q_fn)
    assert path == "dense", path
    assert fast == slow

    _s2, db2, _t2 = _setup(n_parts=1, rows=400, ts_lo=0, ts_hi=2**40, seed=2)
    engine = LocalEngine(db2.table_provider())
    out = []
    engine.scan_table("t").aggregate(
        [E.Sum(E.Col("value"))], [E.Col("timestamp")]
    ).execute(out.append)
    assert engine.last_serving_path == "generic"
    assert "dense" in engine.last_fallback_reasons


def test_filter_clamp_keeps_key_space_small():
    """The range clamp: a narrow ts filter over a wide-spanning table keeps
    the window code space within the fast-path gate (the Parca serving
    pattern — long-lived table, short query window)."""
    _s, db, _t = _setup(rows=2000, ts_lo=0, ts_hi=10**9, seed=4)
    q_fn = lambda q: q.filter(
        E.And(
            E.Col("timestamp").gt_eq(500_000_000),
            E.Col("timestamp").lt(500_060_000),
        )
    ).aggregate([E.Sum(E.Col("value"))], [E.Duration(1000)])
    slow, _ = _run(db, ExecOptions(compiled_serving=False), q_fn)
    fast, path = _run(db, ExecOptions(), q_fn)
    assert path == "compiled", path
    assert fast == slow
    mesh, mpath = _run(db, ExecOptions(mesh=make_mesh(8)), q_fn)
    assert mpath == "mesh"
    assert mesh == slow


def test_windowed_ordered_aggregations():
    _s, db, _t = _setup(seed=6)
    q_fn = QUERIES["parca-range"]
    slow, _ = _run(
        db,
        ExecOptions(compiled_serving=False, ordered_aggregations=True),
        q_fn,
    )
    fast, path = _run(
        db, ExecOptions(ordered_aggregations=True), q_fn
    )
    if path in ("compiled", "dense"):
        assert fast == slow


def test_sql_second_window_through_engine():
    """The sqlparse second() path (visitor.go:332) rides the fast path and
    matches the generic engine byte-for-byte."""
    from frostdb_tpu.sqlparse import Parser

    _s, db, _t = _setup(seed=7)
    sql = "select second(2), sum(value) group by second(2)"

    def run(compiled):
        engine = LocalEngine(
            db.table_provider(), ExecOptions(compiled_serving=compiled)
        )
        r = Parser().parse(engine.scan_table("t"), ["labels"], sql)
        out = []
        r.plan.execute(out.append)
        return _rows(out), engine.last_serving_path

    slow, _ = run(False)
    fast, path = run(True)
    assert path in ("compiled", "dense"), path
    assert fast == slow
    assert slow
