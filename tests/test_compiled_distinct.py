"""Compiled distinct serving (the Parca Types/Values shapes,
bench_test.go:107,123): distinct queries — incl. projected comparison
keys — must ride the fused group machinery byte-identically to the
generic Distinction operator (first-occurrence order, column set,
boolExprProjection semantics)."""

import numpy as np
import pytest

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.query.physical import ExecOptions
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.table import TableConfig


def _mk(n_parts=3, rows=600, seed=0, with_nulls=False, drop_node_part=False):
    store = ColumnStore()
    db = store.db("d")
    table = db.table("t", TableConfig(schema=sample_definition()))
    rng = np.random.default_rng(seed)
    d_et = table.dictionary("example_type")
    d_l = table.dictionary("labels")
    d_st = table.dictionary("stacktrace")
    for p in range(n_parts):
        n = rows + 13 * p
        et, etv = d_et.encode(
            [("cpu", "alloc", "inuse")[int(x)] for x in rng.integers(0, 3, n)]
        )
        st, stv = d_st.encode([f"s{int(x)}" for x in rng.integers(0, 40, n)])
        cols = [
            Column("example_type", KIND_DICT, et, etv, d_et),
            Column("stacktrace", KIND_DICT, st, stv, d_st),
            Column(
                "timestamp",
                KIND_INT64,
                rng.integers(0, 50, n).astype(np.int64),
                np.ones(n, bool),
            ),
            Column(
                "value",
                KIND_INT64,
                rng.integers(0, 1_000_000, n).astype(np.int64),
                np.ones(n, bool),
            ),
        ]
        if not (drop_node_part and p == 1):
            nodes = [f"n{int(x)}" for x in rng.integers(0, 9, n)]
            nc, nv = d_l.encode(nodes)
            if with_nulls:
                nv = rng.random(n) > 0.1
            cols.insert(2, Column("labels.node", KIND_DICT, nc, nv, d_l))
        table.insert_record(ColumnBatch(cols, n))
    return store, db, table


def _run(db, compiled, q_fn):
    engine = LocalEngine(
        db.table_provider(), ExecOptions(compiled_serving=compiled)
    )
    out = []
    q_fn(engine.scan_table("t")).execute(out.append)
    rows = [
        tuple((c.name, c.kind, c.py_value(i)) for c in b.columns)
        for b in out
        for i in range(b.num_rows)
    ]
    return rows, engine


QUERIES = {
    # Values (bench_test.go:123): distinct label values
    "values": lambda q: q.distinct(E.Col("labels.node")),
    # Types (bench_test.go:107): distinct type + projected compare
    "types": lambda q: q.distinct(
        E.Col("example_type"), E.Col("value").gt(500_000)
    ),
    "pair": lambda q: q.distinct(E.Col("example_type"), E.Col("stacktrace")),
    "int-key": lambda q: q.distinct(E.Col("timestamp")),
    "filtered": lambda q: q.filter(E.Col("timestamp").gt_eq(25)).distinct(
        E.Col("example_type"), E.Col("labels.node")
    ),
    "or-filtered": lambda q: q.filter(
        E.Or(E.Col("timestamp").lt(5), E.Col("timestamp").gt(45))
    ).distinct(E.Col("stacktrace")),
    "three-keys": lambda q: q.distinct(
        E.Col("example_type"), E.Col("timestamp"), E.Col("value").lt_eq(250_000)
    ),
    "dict-compare-key": lambda q: q.distinct(
        E.Col("example_type"), E.Col("labels.node").eq("n3")
    ),
}


@pytest.mark.parametrize("qname", sorted(QUERIES))
def test_distinct_compiled_parity(qname):
    _s, db, _t = _mk()
    slow, _e = _run(db, False, QUERIES[qname])
    fast, engine = _run(db, True, QUERIES[qname])
    assert engine.last_serving_path == "compiled_distinct", (
        qname,
        engine.last_serving_path,
        engine.last_fallback_reasons,
    )
    assert fast == slow, qname
    assert slow


def test_null_keys_fall_generic():
    _s, db, _t = _mk(with_nulls=True)
    q_fn = QUERIES["values"]
    slow, _ = _run(db, False, q_fn)
    fast, engine = _run(db, True, q_fn)
    assert engine.last_serving_path == "generic"
    assert fast == slow


def test_missing_dynamic_key_part_falls_generic():
    """A part lacking the distinct key column means the generic engine
    emits a null-key group (unify backfill) — the compiled path declines
    and parity holds."""
    _s, db, _t = _mk(drop_node_part=True)
    q_fn = QUERIES["values"]
    slow, _ = _run(db, False, q_fn)
    fast, engine = _run(db, True, q_fn)
    assert engine.last_serving_path == "generic"
    assert "part lacks" in engine.last_fallback_reasons["compiled_distinct"]
    assert fast == slow


def test_sql_distinct_through_engine():
    """The sqlparse distinct path (projection + distinct) stays served."""
    from frostdb_tpu.sqlparse import Parser

    _s, db, _t = _mk(seed=4)

    def run(compiled):
        engine = LocalEngine(
            db.table_provider(), ExecOptions(compiled_serving=compiled)
        )
        r = Parser().parse(
            engine.scan_table("t"),
            ["labels"],
            "select distinct(example_type, value > 500000)",
        )
        out = []
        r.plan.execute(out.append)
        rows = [
            tuple((c.name, c.py_value(i)) for c in b.columns)
            for b in out
            for i in range(b.num_rows)
        ]
        return rows, engine.last_serving_path

    slow, _ = run(False)
    fast, path = run(True)
    assert fast == slow
    assert path == "compiled_distinct", path
