"""Schema-scan metadata serving (schema_meta.py): the Parca Labels shape
(reference table.go:872 SchemaIterator; bench_test.go:264 Labels) must be
byte-identical to the generic SchemaScanExec -> Distinction ->
PredicateFilter pipeline while running in pure host work."""

import numpy as np

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.table import TableConfig


def build_db(n_parts=3):
    store = ColumnStore()
    db = store.db("t")
    table = db.table("stacktraces", TableConfig(schema=sample_definition()))
    d_l = table.dictionary("labels")
    rng = np.random.default_rng(1)
    for p in range(n_parts):
        n = 500
        cols = [
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
        ]
        # per-part dynamic label columns -> parts have different schemas
        for lbl in ["node", "pod", f"extra{p}"]:
            codes, valid = d_l.encode(
                [f"v{int(i)}" for i in rng.integers(0, 5, n)]
            )
            cols.append(
                Column(f"labels.{lbl}", KIND_DICT, codes, valid, d_l)
            )
        table.insert_record(ColumnBatch(cols, n), sort=True)
    table.sync()
    return store, db


def rows(bs):
    out = []
    for b in bs:
        for i in range(b.num_rows):
            out.append(
                tuple(
                    (
                        c.name,
                        c.dictionary.value_array()[c.values[i]]
                        if c.kind == KIND_DICT and c.validity[i]
                        else (c.values[i] if c.validity[i] else None),
                    )
                    for c in b.columns
                )
            )
    return out


def run_both(db, make_q, expect_path="schema_meta"):
    fe = LocalEngine(db.table_provider())
    ge = LocalEngine(db.table_provider())
    ge.exec_options.compiled_serving = False
    a, b = [], []
    make_q(fe).execute(a.append)
    make_q(ge).execute(b.append)
    if expect_path is not None:
        assert fe.last_serving_path == expect_path, (
            fe.last_serving_path,
            fe.last_fallback_reasons,
        )
    assert rows(a) == rows(b)
    return rows(a)


def test_labels_shape():
    store, db = build_db()
    out = run_both(
        db,
        lambda e: e.scan_schema("stacktraces")
        .distinct(E.Col("name"))
        .filter(E.Col("name").regex_match(r"^labels\..+$")),
    )
    names = [dict(r)["name"] for r in out]
    assert "labels.node" in names and "labels.extra2" in names
    assert all(n.startswith("labels.") for n in names)


def test_no_filter_and_filter_below():
    store, db = build_db()
    run_both(
        db, lambda e: e.scan_schema("stacktraces").distinct(E.Col("name"))
    )
    run_both(
        db,
        lambda e: e.scan_schema("stacktraces")
        .filter(E.Col("name").regex_match("^l"))
        .distinct(E.Col("name")),
    )


def test_filter_variants():
    store, db = build_db()
    for make in (
        lambda e: e.scan_schema("stacktraces")
        .distinct(E.Col("name"))
        .filter(E.Col("name").eq("value")),
        lambda e: e.scan_schema("stacktraces")
        .distinct(E.Col("name"))
        .filter(E.Col("name").regex_not_match("^labels")),
        lambda e: e.scan_schema("stacktraces")
        .distinct(E.Col("name"))
        .filter(E.Col("name").regex_match("nomatch-anywhere")),
    ):
        run_both(db, make)


def test_empty_table():
    store = ColumnStore()
    db = store.db("t")
    db.table("empty", TableConfig(schema=sample_definition()))
    run_both(
        db,
        lambda e: e.scan_schema("empty").distinct(E.Col("name")),
    )


def test_non_name_distinct_falls_back():
    store, db = build_db()
    run_both(
        db,
        lambda e: e.scan_schema("stacktraces").distinct(E.Col("other")),
        expect_path="generic",
    )
