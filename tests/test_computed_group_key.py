"""Projection-computed group keys ``(col / k) * k as alias`` (VERDICT r4
item 6; reference project.go:405 binaryExprProjection as a group key) on
the fast tiers: Go-truncating division agrees with the window machinery's
floor division exactly on provably-nonnegative ranges — negative ranges
must stay generic."""

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


def build_db(seed=0, ts_lo=0, ts_hi=50_000):
    store = ColumnStore()
    db = store.db("d")
    table = db.table("t", TableConfig(schema=sample_definition()))
    d_l = table.dictionary("labels")
    rng = np.random.default_rng(seed)
    for _ in range(3):
        n = 3000
        lc, lv = d_l.encode(
            [f"g{int(i)}" for i in rng.integers(0, 5, n)]
        )
        table.insert_record(
            ColumnBatch(
                [
                    Column("labels.label1", KIND_DICT, lc, lv, d_l),
                    Column(
                        "timestamp",
                        KIND_INT64,
                        rng.integers(ts_lo, ts_hi, n).astype(np.int64),
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


BUCKET = E.BinaryExpr(
    E.BinaryExpr(E.Col("timestamp"), E.OP_DIV, E.Literal(1000)),
    E.OP_MUL,
    E.Literal(1000),
).alias("timestamp_bucket")


def rows(bs):
    return [
        tuple((c.name, c.py_value(i)) for c in b.columns)
        for b in bs
        for i in range(b.num_rows)
    ]


def _run(db, opts, make_q):
    engine = LocalEngine(db.table_provider(), exec_options=opts)
    out = []
    make_q(engine).execute(out.append)
    return rows(out), engine.last_serving_path, engine.last_fallback_reasons


QUERIES = [
    lambda e: e.scan_table("t")
    .project(E.Col("value"), BUCKET)
    .aggregate([E.Sum(E.Col("value"))], [E.Col("timestamp_bucket")]),
    lambda e: e.scan_table("t")
    .filter(E.Col("timestamp").gt_eq(10_000))
    .project(E.Col("value"), BUCKET)
    .aggregate(
        [E.Sum(E.Col("value")), E.Count(E.Col("value"))],
        [E.Col("timestamp_bucket")],
    ),
    lambda e: e.scan_table("t")
    .project(E.Col("value"), E.Col("labels.label1"), BUCKET)
    .aggregate(
        [E.Sum(E.Col("value"))],
        [E.Col("labels.label1"), E.Col("timestamp_bucket")],
    ),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_compiled_parity(qi):
    store, db = build_db()
    generic, _p, _r = _run(
        db, ExecOptions(compiled_serving=False), QUERIES[qi]
    )
    fast, path, reasons = _run(
        db, ExecOptions(compiled_serving=True), QUERIES[qi]
    )
    assert path == "compiled", (path, reasons)
    assert fast == generic
    assert any("timestamp_bucket" in dict(r) for r in fast)


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_mesh_parity(qi):
    store, db = build_db(seed=2)
    generic, _p, _r = _run(
        db, ExecOptions(compiled_serving=False), QUERIES[qi]
    )
    for n_dev in (1, 8):
        fast, path, reasons = _run(
            db, ExecOptions(mesh=make_mesh(n_dev)), QUERIES[qi]
        )
        assert path == "mesh", (path, reasons)
        assert fast == generic


def test_negative_range_stays_generic():
    # Go trunc-div disagrees with floor-div below zero: must fall back.
    store, db = build_db(ts_lo=-20_000, ts_hi=20_000)
    generic, _p, _r = _run(
        db, ExecOptions(compiled_serving=False), QUERIES[0]
    )
    fast, path, _r = _run(db, ExecOptions(compiled_serving=True), QUERIES[0])
    assert path == "generic"
    assert fast == generic


def test_negative_values_clamped_by_filter_compile():
    # Negative timestamps exist but the filter excludes them -> the
    # effective range is nonnegative and the fast tier applies.
    store, db = build_db(ts_lo=-20_000, ts_hi=20_000)
    q = (
        lambda e: e.scan_table("t")
        .filter(E.Col("timestamp").gt_eq(0))
        .project(E.Col("value"), BUCKET)
        .aggregate([E.Sum(E.Col("value"))], [E.Col("timestamp_bucket")])
    )
    generic, _p, _r = _run(db, ExecOptions(compiled_serving=False), q)
    fast, path, reasons = _run(db, ExecOptions(compiled_serving=True), q)
    assert path == "compiled", (path, reasons)
    assert fast == generic
