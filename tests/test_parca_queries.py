"""Parca-style macro query shapes (reference: bench_test.go:107-375 —
Types / Labels / Values / Merge / Range / Filter). These are the reference's
production query harnesses; here they run as integration tests over sample
data and assert exact results."""

import numpy as np

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.table import TableConfig


def _setup():
    store = ColumnStore()
    db = store.db("parca")
    table = db.table("stacktraces", TableConfig(schema=sample_definition()))
    d_et = table.dictionary("example_type")
    d_l = table.dictionary("labels")
    d_st = table.dictionary("stacktrace")

    rows = [
        ("cpu", {"node": "n1", "pod": "p1"}, "s1", 10, 3),
        ("cpu", {"node": "n1", "pod": "p2"}, "s2", 11, 5),
        ("cpu", {"node": "n2"}, "s1", 12, 7),
        ("alloc", {"node": "n1"}, "s3", 13, 11),
        ("alloc", {"node": "n2", "pod": "p1"}, "s1", 14, 13),
    ]
    label_names = sorted({k for _t, labels, *_ in rows for k in labels})
    n = len(rows)
    cols = {}
    et, etv = d_et.encode([r[0] for r in rows])
    st, stv = d_st.encode([r[2] for r in rows])
    cols["example_type"] = Column("example_type", KIND_DICT, et, etv, d_et)
    cols["stacktrace"] = Column("stacktrace", KIND_DICT, st, stv, d_st)
    for ln in label_names:
        codes, valid = d_l.encode([r[1].get(ln) for r in rows])
        cols[f"labels.{ln}"] = Column(f"labels.{ln}", KIND_DICT, codes, valid, d_l)
    cols["timestamp"] = Column(
        "timestamp",
        KIND_INT64,
        np.asarray([r[3] for r in rows], dtype=np.int64),
        np.ones(n, dtype=bool),
    )
    cols["value"] = Column(
        "value",
        KIND_INT64,
        np.asarray([r[4] for r in rows], dtype=np.int64),
        np.ones(n, dtype=bool),
    )
    order = sorted(cols)
    batch = ColumnBatch([cols[k] for k in order], n)
    table.insert_record(batch, sort=True)
    return store, db, LocalEngine(db.table_provider())


def _rows(batches):
    out = []
    for b in batches:
        for i in range(b.num_rows):
            out.append(tuple(c.py_value(i) for c in b.columns))
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def test_types_query():
    """reference: getTypesQuery — distinct over type columns + a projected
    comparison (bench_test.go:107)."""
    _s, _db, engine = _setup()
    res = []
    engine.scan_table("stacktraces").distinct(
        E.Col("example_type"), E.Col("value").gt(6)
    ).execute(res.append)
    assert _rows(res) == sorted(
        [("alloc", True), ("cpu", False), ("cpu", True)],
        key=lambda r: tuple(str(x) for x in r),
    )


def test_labels_query_schema_scan():
    """reference: getLabelsQuery — schema scan + distinct + regex
    (bench_test.go:117)."""
    _s, _db, engine = _setup()
    res = []
    engine.scan_schema("stacktraces").distinct(E.Col("name")).filter(
        E.Col("name").regex_match(r"^labels\..+$")
    ).execute(res.append)
    assert _rows(res) == [("labels.node",), ("labels.pod",)]


def test_values_query():
    """reference: getValuesForLabelQuery (bench_test.go:123)."""
    _s, _db, engine = _setup()
    res = []
    engine.scan_table("stacktraces").distinct(E.Col("labels.node")).execute(
        res.append
    )
    assert _rows(res) == [("n1",), ("n2",)]


def test_merge_query():
    """reference: Merge — filtered sum(value) by stacktrace
    (bench_test.go:299)."""
    _s, _db, engine = _setup()
    res = []
    engine.scan_table("stacktraces").filter(
        E.And(
            E.Col("example_type").eq("cpu"),
            E.Col("timestamp").gt(9),
            E.Col("timestamp").lt(13),
        )
    ).aggregate([E.Sum(E.Col("value"))], [E.Col("stacktrace")]).execute(
        res.append
    )
    got = {
        res[0].column("stacktrace").py_value(i): int(
            res[0].column("sum(value)").values[i]
        )
        for i in range(res[0].num_rows)
    }
    assert got == {"s1": 10, "s2": 5}


def test_range_query():
    """reference: Range — sum(value) by (labels, timestamp)
    (bench_test.go:322)."""
    _s, _db, engine = _setup()
    res = []
    engine.scan_table("stacktraces").filter(
        E.Col("example_type").eq("cpu")
    ).aggregate(
        [E.Sum(E.Col("value"))], [E.DynCol("labels"), E.Col("timestamp")]
    ).execute(res.append)
    assert sum(b.num_rows for b in res) == 3  # three distinct label/ts rows
    total = sum(
        int(v) for b in res for v in b.column("sum(value)").values
    )
    assert total == 15
