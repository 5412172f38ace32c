"""unique()/and() aggregations on the fast tiers (VERDICT r4 item 4): the
reference's Unique/AndAgg kernels (aggregate.go:718-798, expr.go:648-798)
must serve from compiled/dense/mesh byte-identically to the generic
engine's kernels.segment_agg semantics."""

import numpy as np
import pytest

from frostdb_tpu.columnbatch import (
    Column,
    ColumnBatch,
    KIND_BOOL,
    KIND_DICT,
    KIND_INT64,
)
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.parallel.mesh import make_mesh
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.query.physical import ExecOptions
from frostdb_tpu.schema import (
    ColumnDef,
    ENCODING_RLE_DICTIONARY,
    SchemaDef,
    SortingColumnDef,
    StorageLayout,
    TYPE_BOOL,
    TYPE_INT64,
    TYPE_STRING,
)
from frostdb_tpu.table import TableConfig


def _schema():
    return SchemaDef(
        "t",
        (
            ColumnDef(
                "g",
                StorageLayout(
                    TYPE_STRING,
                    nullable=True,
                    encoding=ENCODING_RLE_DICTIONARY,
                ),
            ),
            ColumnDef("ts", StorageLayout(TYPE_INT64)),
            ColumnDef("v", StorageLayout(TYPE_INT64, nullable=True)),
            ColumnDef("b", StorageLayout(TYPE_BOOL, nullable=True)),
        ),
        (SortingColumnDef("g", "asc", True),),
    )


def build_db(seed=0, n_parts=3, n=2500, n_groups=12, value_span=5):
    store = ColumnStore()
    db = store.db("d")
    table = db.table("t", TableConfig(schema=_schema()))
    dg = table.dictionary("g")
    rng = np.random.default_rng(seed)
    for _ in range(n_parts):
        gc, gv = dg.encode(
            [f"g{int(i)}" for i in rng.integers(0, n_groups, n)]
        )
        # values constant within ~half the groups (unique hits), varied in
        # the rest; nulls sprinkled
        base = (gc.astype(np.int64) * 7) % 23
        varied = rng.integers(0, value_span, n).astype(np.int64)
        v = np.where(gc % 2 == 0, base, base + varied)
        vv = rng.random(n) > 0.15
        b = rng.random(n) > 0.3
        bv = rng.random(n) > 0.2
        table.insert_record(
            ColumnBatch(
                [
                    Column("g", KIND_DICT, gc, gv, dg),
                    Column(
                        "ts",
                        KIND_INT64,
                        rng.integers(0, 1000, n).astype(np.int64),
                        np.ones(n, bool),
                    ),
                    Column("v", KIND_INT64, np.where(vv, v, 0), vv),
                    Column("b", KIND_BOOL, np.where(bv, b, False), bv),
                ],
                n,
            ),
            sort=True,
        )
    table.sync()
    return store, db


def rows(bs):
    out = []
    for b in bs:
        for i in range(b.num_rows):
            row = []
            for c in b.columns:
                if not c.validity[i]:
                    row.append((c.name, None))
                elif c.kind == KIND_DICT:
                    row.append(
                        (c.name, c.dictionary.value_array()[c.values[i]])
                    )
                elif c.kind == "bool":
                    row.append((c.name, bool(c.values[i])))
                else:
                    row.append((c.name, c.values[i]))
            out.append(tuple(row))
    return out


def _run(db, opts, make_q):
    engine = LocalEngine(db.table_provider(), exec_options=opts)
    out = []
    make_q(engine).execute(out.append)
    return rows(out), engine.last_serving_path, engine.last_fallback_reasons


QUERIES = [
    lambda e: e.scan_table("t").aggregate(
        [E.Unique(E.Col("v"))], [E.Col("g")]
    ),
    lambda e: e.scan_table("t").aggregate(
        [E.AndAgg(E.Col("b"))], [E.Col("g")]
    ),
    lambda e: e.scan_table("t").aggregate(
        [
            E.Unique(E.Col("v")),
            E.AndAgg(E.Col("b")),
            E.Sum(E.Col("v")),
            E.Min(E.Col("v")),
            E.Max(E.Col("v")),
            E.Count(E.Col("v")),
        ],
        [E.Col("g")],
    ),
    lambda e: e.scan_table("t")
    .filter(E.Col("ts").lt(600))
    .aggregate(
        [E.Unique(E.Col("v")), E.AndAgg(E.Col("b"))], [E.Col("g")]
    ),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_compiled_parity(qi):
    store, db = build_db()
    q = QUERIES[qi]
    generic, _p, _r = _run(db, ExecOptions(compiled_serving=False), q)
    fast, path, reasons = _run(db, ExecOptions(compiled_serving=True), q)
    assert path == "compiled", (path, reasons)
    assert fast == generic


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_mesh_parity(qi):
    store, db = build_db(seed=3)
    q = QUERIES[qi]
    generic, _p, _r = _run(db, ExecOptions(compiled_serving=False), q)
    for n_dev in (1, 8):
        fast, path, reasons = _run(db, ExecOptions(mesh=make_mesh(n_dev)), q)
        assert path == "mesh", (path, reasons)
        assert fast == generic


def test_dense_tier_parity():
    # group space past the Pallas 2048-code ceiling -> dense tier
    store, db = build_db(seed=5, n_groups=3000, n=4000)
    q = QUERIES[2]
    generic, _p, _r = _run(db, ExecOptions(compiled_serving=False), q)
    fast, path, reasons = _run(db, ExecOptions(compiled_serving=True), q)
    assert path == "dense", (path, reasons)
    assert fast == generic


def test_unique_all_null_and_empty_groups():
    # groups whose every value slot is null -> unique emits null; and()
    # over all-null -> true
    store = ColumnStore()
    db = store.db("d")
    table = db.table("t", TableConfig(schema=_schema()))
    dg = table.dictionary("g")
    n = 300
    rng = np.random.default_rng(2)
    gc, gv = dg.encode([f"g{int(i)}" for i in rng.integers(0, 4, n)])
    vv = gc % 4 != 1  # group g1's slots all null
    bv = gc % 4 != 2
    table.insert_record(
        ColumnBatch(
            [
                Column("g", KIND_DICT, gc, gv, dg),
                Column(
                    "ts", KIND_INT64,
                    np.arange(n, dtype=np.int64), np.ones(n, bool),
                ),
                Column(
                    "v", KIND_INT64,
                    np.where(vv, np.int64(7), 0), vv,
                ),
                Column(
                    "b", KIND_BOOL,
                    np.where(bv, True, False), bv,
                ),
            ],
            n,
        ),
        sort=True,
    )
    table.sync()
    q = QUERIES[2]
    generic, _p, _r = _run(db, ExecOptions(compiled_serving=False), q)
    fast, path, reasons = _run(db, ExecOptions(compiled_serving=True), q)
    assert path == "compiled", (path, reasons)
    assert fast == generic
    byg = {dict(r)["g"]: dict(r) for r in fast}
    assert byg["g1"]["unique(v)"] is None  # all-null group
    assert byg["g2"]["and(b)"] is True  # and over all-null = true


def test_fuzz_parity_tiers():
    for seed in (11, 12, 13):
        store, db = build_db(
            seed=seed, n_parts=2 + seed % 2, n=1200,
            n_groups=6 + seed, value_span=seed % 3 + 1,
        )
        for q in QUERIES:
            generic, _p, _r = _run(
                db, ExecOptions(compiled_serving=False), q
            )
            fast, path, reasons = _run(
                db, ExecOptions(compiled_serving=True), q
            )
            assert path == "compiled", (path, reasons)
            assert fast == generic
            mesh, path, reasons = _run(
                db, ExecOptions(mesh=make_mesh(8)), q
            )
            assert path == "mesh", (path, reasons)
            assert mesh == generic
