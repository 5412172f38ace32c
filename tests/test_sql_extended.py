"""North-star SQL surface (VERDICT r4 missing #6): FROM/JOIN/IN/ORDER BY in
the SQL frontend and the ORDER BY Sorter operator — surface the engine's
join and sorted emission through SQL (the reference's sqlparse has
neither)."""

import numpy as np
import pytest

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.schema import (
    ColumnDef,
    ENCODING_RLE_DICTIONARY,
    SchemaDef,
    SortingColumnDef,
    StorageLayout,
    TYPE_INT64,
    TYPE_STRING,
    sample_definition,
)
from frostdb_tpu.sqlparse import Parser
from frostdb_tpu.table import TableConfig


def build_db():
    store = ColumnStore()
    db = store.db("d")
    table = db.table("stacktraces", TableConfig(schema=sample_definition()))
    d_l = table.dictionary("labels")
    rng = np.random.default_rng(0)
    n = 4000
    lc, lv = d_l.encode([f"n{int(i)}" for i in rng.integers(0, 10, n)])
    table.insert_record(
        ColumnBatch(
            [
                Column("labels.node", KIND_DICT, lc, lv, d_l),
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
    dims = db.table(
        "dims",
        TableConfig(
            schema=SchemaDef(
                "dims",
                (
                    ColumnDef(
                        "labels.node",
                        StorageLayout(
                            TYPE_STRING,
                            nullable=True,
                            encoding=ENCODING_RLE_DICTIONARY,
                        ),
                    ),
                    ColumnDef("weight", StorageLayout(TYPE_INT64)),
                ),
                (SortingColumnDef("labels.node", "asc", True),),
            )
        ),
    )
    d_d = dims.dictionary("labels")
    codes, _ = d_d.encode([f"n{i}" for i in range(0, 10, 2)])
    m = len(codes)
    dims.insert_record(
        ColumnBatch(
            [
                Column(
                    "labels.node", KIND_DICT, codes, np.ones(m, bool), d_d
                ),
                Column(
                    "weight",
                    KIND_INT64,
                    np.arange(m, dtype=np.int64) * 3,
                    np.ones(m, bool),
                ),
            ],
            m,
        )
    )
    return store, db


def run_sql(db, sql):
    engine = LocalEngine(db.table_provider())
    res = Parser().parse(
        engine.scan_table("stacktraces"), ["labels"], sql
    )
    out = []
    res.plan.execute(out.append)
    rows = [
        tuple((c.name, c.py_value(i)) for c in b.columns)
        for b in out
        for i in range(b.num_rows)
    ]
    return rows, engine.last_serving_path


def test_order_by_builder():
    store, db = build_db()
    engine = LocalEngine(db.table_provider())
    out = []
    engine.scan_table("stacktraces").filter(
        E.Col("timestamp").lt(100)
    ).project(E.Col("value"), E.Col("timestamp")).order_by(
        ("value", "desc"), "timestamp"
    ).execute(out.append)
    vals = [
        (int(b.column("value").values[i]), int(b.column("timestamp").values[i]))
        for b in out
        for i in range(b.num_rows)
    ]
    assert vals == sorted(vals, key=lambda t: (-t[0], t[1]))
    assert len(vals) > 10


def test_sql_order_by_and_limit():
    store, db = build_db()
    rows, _p = run_sql(
        db,
        "select value, timestamp where timestamp < 200"
        " order by value desc, timestamp limit 7",
    )
    assert len(rows) == 7
    vals = [(dict(r)["value"], dict(r)["timestamp"]) for r in rows]
    assert vals == sorted(vals, key=lambda t: (-t[0], t[1]))[:7]


def test_sql_in_list_serves_compiled():
    store, db = build_db()
    rows, path = run_sql(
        db,
        "select sum(value), labels.node where labels.node in"
        " ('n1', 'n3', 'n5') group by labels.node",
    )
    assert path == "compiled", path
    nodes = {dict(r)["labels.node"] for r in rows}
    assert nodes == {"n1", "n3", "n5"}
    rows2, _ = run_sql(
        db,
        "select count(value), labels.node where labels.node not in ('n1')"
        " group by labels.node",
    )
    assert "n1" not in {dict(r)["labels.node"] for r in rows2}


def test_sql_from_join_group_by():
    store, db = build_db()
    rows, path = run_sql(
        db,
        "select sum(weight), labels.node from stacktraces"
        " inner join dims on labels.node group by labels.node",
    )
    # served by the groupjoin fusion; parity vs the builder API
    assert path == "compiled_join", path
    engine = LocalEngine(db.table_provider())
    engine.exec_options.compiled_serving = False
    out = []
    engine.scan_table("stacktraces").join(
        engine.scan_table("dims"), on=["labels.node"], how="inner"
    ).aggregate([E.Sum(E.Col("weight"))], [E.Col("labels.node")]).execute(
        out.append
    )
    want = [
        tuple((c.name, c.py_value(i)) for c in b.columns)
        for b in out
        for i in range(b.num_rows)
    ]
    # SQL plan emits (sum, node) projection order; compare as dicts
    assert [dict(r) for r in rows] == [dict(r) for r in want]


def test_sql_semi_anti_join():
    store, db = build_db()
    rows_semi, _ = run_sql(
        db,
        "select count(value), labels.node from stacktraces semi join dims"
        " using (labels.node) group by labels.node",
    )
    rows_anti, _ = run_sql(
        db,
        "select count(value), labels.node from stacktraces anti join dims"
        " using (labels.node) group by labels.node",
    )
    semi_nodes = {dict(r)["labels.node"] for r in rows_semi}
    anti_nodes = {dict(r)["labels.node"] for r in rows_anti}
    assert semi_nodes == {f"n{i}" for i in range(0, 10, 2)}
    assert anti_nodes == {f"n{i}" for i in range(1, 10, 2)}


def test_sql_explain_join_order():
    store, db = build_db()
    engine = LocalEngine(db.table_provider())
    res = Parser().parse(
        engine.scan_table("stacktraces"),
        ["labels"],
        "explain select value where timestamp < 10 order by value limit 3",
    )
    s = res.plan.explain()
    assert "OrderBy (value)" in s and "Limit(3)" in s


def test_epilogue_peeling_serves_fast_tiers():
    # ORDER BY / LIMIT above an aggregation peel off and the fused tier
    # serves the core; results byte-identical to generic.
    store, db = build_db()
    sql = (
        "select sum(value), labels.node where timestamp < 500"
        " group by labels.node order by labels.node desc limit 4"
    )
    rows, path = run_sql(db, sql)
    assert path == "compiled", path
    engine = LocalEngine(db.table_provider())
    engine.exec_options.compiled_serving = False
    res = Parser().parse(engine.scan_table("stacktraces"), ["labels"], sql)
    out = []
    res.plan.execute(out.append)
    want = [
        tuple((c.name, c.py_value(i)) for c in b.columns)
        for b in out
        for i in range(b.num_rows)
    ]
    assert rows == want and len(rows) == 4
    nodes = [dict(r)["labels.node"] for r in rows]
    assert nodes == sorted(nodes, reverse=True)


def test_join_epilogue_served_by_fusion():
    store, db = build_db()
    sql = (
        "select sum(weight), labels.node from stacktraces inner join dims"
        " on labels.node where labels.node in ('n0','n2','n4')"
        " group by labels.node order by labels.node desc limit 2"
    )
    rows, path = run_sql(db, sql)
    assert path == "compiled_join", path
    assert [dict(r)["labels.node"] for r in rows] == ["n4", "n2"]


def test_sql_having():
    store, db = build_db()
    rows, _p = run_sql(
        db,
        "select sum(value) as total, labels.node group by labels.node"
        " having total > 15000 order by total desc",
    )
    totals = [dict(r)["total"] for r in rows]
    assert totals and all(t > 15000 for t in totals)
    assert totals == sorted(totals, reverse=True)
    # having on the un-aliased result name
    rows2, _p = run_sql(
        db,
        "select count(value), labels.node group by labels.node"
        " having count(value) > 380",
    )
    assert all(dict(r)["count(value)"] > 380 for r in rows2)
    assert rows2
