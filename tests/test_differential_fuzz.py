"""Cross-tier differential fuzzing: random schemas, data (nulls, negative
values, float edge cases), and query shapes (CNF filters, multi/windowed/
computed group keys, every aggregation, joins, ORDER BY/LIMIT epilogues)
executed through the engine with fast tiers enabled, on an 8-device mesh,
and on the generic operator DAG — all three must agree byte-for-byte.

This is the semantic-oracle property the serving architecture is built on
(every tier must PROVE the generic result); the directed suites pin known
shapes, this harness sweeps the combination space."""

import numpy as np
import pytest

from frostdb_tpu.columnbatch import (
    Column,
    ColumnBatch,
    KIND_BOOL,
    KIND_DICT,
    KIND_FLOAT64,
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
    TYPE_DOUBLE,
    TYPE_INT64,
    TYPE_STRING,
)
from frostdb_tpu.table import TableConfig

FLOAT_EDGE = np.array(
    [-0.0, 0.0, 1.5, -2.25, np.inf, -np.inf, np.nan, 1e300, 5e-324, 3.0]
)


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
            ColumnDef(
                "h",
                StorageLayout(
                    TYPE_STRING,
                    nullable=True,
                    encoding=ENCODING_RLE_DICTIONARY,
                ),
            ),
            ColumnDef("ts", StorageLayout(TYPE_INT64)),
            ColumnDef("v", StorageLayout(TYPE_INT64, nullable=True)),
            ColumnDef("f", StorageLayout(TYPE_DOUBLE, nullable=True)),
            ColumnDef("b", StorageLayout(TYPE_BOOL, nullable=True)),
        ),
        (SortingColumnDef("g", "asc", True),),
    )


def build_db(rng):
    store = ColumnStore()
    db = store.db("fz")
    t = db.table("t", TableConfig(schema=_schema()))
    dg = t.dictionary("g")
    dh = t.dictionary("h")
    n_parts = int(rng.integers(1, 4))
    for _ in range(n_parts):
        n = int(rng.integers(200, 1500))
        gkinds = int(rng.integers(2, 9))
        gc, gv = dg.encode([f"g{int(i)}" for i in rng.integers(0, gkinds, n)])
        if rng.random() < 0.3:  # sometimes null group keys
            gv = gv & (rng.random(n) > 0.05)
            gc = np.where(gv, gc, 0)
        hc, hv = dh.encode([f"h{int(i)}" for i in rng.integers(0, 3, n)])
        span = 10 ** int(rng.integers(2, 6))
        ts = rng.integers(0, span, n).astype(np.int64)
        vscale = 10 ** int(rng.integers(1, 9))
        v = rng.integers(-vscale, vscale, n).astype(np.int64)
        vv = rng.random(n) > (0.15 if rng.random() < 0.5 else 0.0)
        f = FLOAT_EDGE[rng.integers(0, len(FLOAT_EDGE), n)]
        fv = rng.random(n) > 0.1
        b = rng.random(n) > 0.4
        bv = rng.random(n) > 0.2
        t.insert_record(
            ColumnBatch(
                [
                    Column("g", KIND_DICT, gc, gv, dg),
                    Column("h", KIND_DICT, hc, hv, dh),
                    Column("ts", KIND_INT64, ts, np.ones(n, bool)),
                    Column("v", KIND_INT64, np.where(vv, v, 0), vv),
                    Column("f", KIND_FLOAT64, np.where(fv, f, 0.0), fv),
                    Column("b", KIND_BOOL, np.where(bv, b, False), bv),
                ],
                n,
            ),
            sort=bool(rng.random() < 0.7),
        )
    t.sync()
    return store, db


def random_filter(rng, span):
    leaves = []
    n_cl = int(rng.integers(0, 4))
    for _ in range(n_cl):
        kind = rng.random()
        if kind < 0.5:
            op = rng.choice(["<", "<=", ">", ">=", "==", "!="])
            lit = int(rng.integers(-span // 10, span))
            leaves.append(
                E.BinaryExpr(E.Col("ts"), str(op), E.Literal(lit))
            )
        elif kind < 0.8:
            val = f"g{int(rng.integers(0, 10))}"
            op = rng.choice([E.OP_EQ, E.OP_NOT_EQ, E.OP_REGEX_MATCH])
            lit = val if op != E.OP_REGEX_MATCH else f"^g[{int(rng.integers(0,5))}-9]"
            leaves.append(E.BinaryExpr(E.Col("g"), str(op), E.Literal(lit)))
        else:
            # OR clause of two int leaves
            a = int(rng.integers(0, span))
            b = int(rng.integers(0, span))
            leaves.append(
                E.Or(
                    E.Col("ts").lt(min(a, b)),
                    E.Col("ts").gt_eq(max(a, b)),
                )
            )
    if not leaves:
        return None
    e = leaves[0]
    for l in leaves[1:]:
        e = E.And(e, l)
    return e


def random_aggs(rng):
    pool = [
        E.Sum(E.Col("v")),
        E.Count(E.Col("v")),
        E.Min(E.Col("v")),
        E.Max(E.Col("v")),
        E.Avg(E.Col("v")),
        E.Sum(E.Col("f")),
        E.Min(E.Col("f")),
        E.Max(E.Col("f")),
        E.Unique(E.Col("v")),
        E.AndAgg(E.Col("b")),
    ]
    k = int(rng.integers(1, 5))
    idx = rng.choice(len(pool), size=k, replace=False)
    return [pool[i] for i in idx]


def random_groups(rng):
    r = rng.random()
    if r < 0.4:
        return [E.Col("g")]
    if r < 0.6:
        return [E.Col("g"), E.Col("h")]
    if r < 0.8:
        return [E.Duration(int(rng.integers(1, 50)) * 1000)]
    return [E.Col("h"), E.Duration(int(rng.integers(1, 20)) * 1000)]


def rows(bs):
    out = []
    for b in bs:
        for i in range(b.num_rows):
            row = []
            for c in b.columns:
                val = c.py_value(i)
                if isinstance(val, float):
                    val = repr(val) + ("/n" if np.signbit(val) else "")
                row.append((c.name, val))
            out.append(tuple(row))
    return out


def _run(db, opts, make_q):
    engine = LocalEngine(db.table_provider(), exec_options=opts)
    out = []
    make_q(engine).execute(out.append)
    return rows(out), engine.last_serving_path


@pytest.mark.parametrize("seed", range(20))
def test_aggregate_differential(seed):
    rng = np.random.default_rng(1000 + seed)
    store, db = build_db(rng)
    span = 10**5

    for _q in range(3):
        filt = random_filter(rng, span)
        aggs = random_aggs(rng)
        groups = random_groups(rng)

        def make_q(e):
            q = e.scan_table("t")
            if filt is not None:
                q = q.filter(filt)
            return q.aggregate(aggs, groups)

        generic, _ = _run(db, ExecOptions(compiled_serving=False), make_q)
        fast, path = _run(db, ExecOptions(compiled_serving=True), make_q)
        assert fast == generic, (seed, path, filt, aggs, groups)
        mesh, mpath = _run(db, ExecOptions(mesh=make_mesh(4)), make_q)
        assert mesh == generic, (seed, mpath, filt, aggs, groups)


@pytest.mark.parametrize("seed", range(8))
def test_scan_and_epilogue_differential(seed):
    rng = np.random.default_rng(5000 + seed)
    store, db = build_db(rng)
    span = 10**5

    # filter -> project (-> limit): the compiled_scan envelope
    filt = random_filter(rng, span) or E.Col("ts").gt_eq(0)
    lim = int(rng.integers(0, 50))

    def make_scan(e):
        q = e.scan_table("t").filter(filt).project(
            E.Col("g"), E.Col("v"), E.Col("f")
        )
        if lim:
            q = q.limit(E.Literal(lim))
        return q

    generic, _ = _run(db, ExecOptions(compiled_serving=False), make_scan)
    fast, _p = _run(db, ExecOptions(compiled_serving=True), make_scan)
    assert fast == generic, (seed, filt, lim)

    # aggregate -> order_by -> limit: the epilogue peel
    aggs = random_aggs(rng)
    groups = [E.Col("g")]
    ord_lit = int(rng.integers(0, span))

    def make_ord(e):
        return (
            e.scan_table("t")
            .filter(E.Col("ts").gt_eq(ord_lit))
            .aggregate(aggs, groups)
            .order_by("g")
            .limit(E.Literal(3))
        )

    generic, _ = _run(db, ExecOptions(compiled_serving=False), make_ord)
    fast, _p = _run(db, ExecOptions(compiled_serving=True), make_ord)
    assert fast == generic, (seed, aggs)


@pytest.mark.parametrize("seed", range(6))
def test_join_differential(seed):
    rng = np.random.default_rng(9000 + seed)
    store, db = build_db(rng)
    # build side over a subset of g values, with duplicates and nulls
    dims = db.table(
        "dims",
        TableConfig(
            schema=SchemaDef(
                "dims",
                (
                    ColumnDef(
                        "g",
                        StorageLayout(
                            TYPE_STRING,
                            nullable=True,
                            encoding=ENCODING_RLE_DICTIONARY,
                        ),
                    ),
                    ColumnDef("w", StorageLayout(TYPE_INT64, nullable=True)),
                ),
                (SortingColumnDef("g", "asc", True),),
            )
        ),
    )
    dd = dims.dictionary("g")
    vals = [f"g{int(i)}" for i in rng.integers(0, 10, int(rng.integers(2, 12)))]
    codes, valid = dd.encode(vals)
    m = len(codes)
    wv = rng.random(m) > 0.2
    lo = -50 if rng.random() < 0.5 else 0
    dims.insert_record(
        ColumnBatch(
            [
                Column("g", KIND_DICT, codes, valid, dd),
                Column(
                    "w",
                    KIND_INT64,
                    np.where(wv, rng.integers(lo, 100, m), 0).astype(
                        np.int64
                    ),
                    wv,
                ),
            ],
            m,
        )
    )

    for how in ("inner", "left_outer", "semi", "anti"):
        aggs = (
            [E.Sum(E.Col("w")), E.Count(E.Col("v")), E.Min(E.Col("w"))]
            if how in ("inner", "left_outer")
            else [E.Sum(E.Col("v")), E.Count(E.Col("v"))]
        )

        def make_q(e):
            return (
                e.scan_table("t")
                .join(e.scan_table("dims"), on=["g"], how=how)
                .aggregate(aggs, [E.Col("g")])
            )

        generic, _ = _run(db, ExecOptions(compiled_serving=False), make_q)
        fast, path = _run(db, ExecOptions(compiled_serving=True), make_q)
        assert fast == generic, (seed, how, path)


@pytest.mark.parametrize("seed", range(4))
def test_int_key_join_differential(seed):
    rng = np.random.default_rng(13000 + seed)
    store, db = build_db(rng)
    # add an int64 id column table pair via a second fact/dims pairing on ts
    dims = db.table(
        "idims",
        TableConfig(
            schema=SchemaDef(
                "idims",
                (
                    ColumnDef(
                        "ts", StorageLayout(TYPE_INT64, nullable=True)
                    ),
                    ColumnDef(
                        "w", StorageLayout(TYPE_INT64, nullable=True)
                    ),
                ),
                (),
            )
        ),
    )
    m = int(rng.integers(5, 300))
    dv = rng.random(m) > 0.1
    dims.insert_record(
        ColumnBatch(
            [
                Column(
                    "ts",
                    KIND_INT64,
                    np.where(
                        dv, rng.integers(0, 10**5, m), 0
                    ).astype(np.int64),
                    dv,
                ),
                Column(
                    "w",
                    KIND_INT64,
                    rng.integers(0, 50, m).astype(np.int64),
                    rng.random(m) > 0.2,
                ),
            ],
            m,
        )
    )
    for how in ("inner", "semi", "anti"):
        aggs = (
            [E.Sum(E.Col("w")), E.Count(E.Col("v"))]
            if how == "inner"
            else [E.Sum(E.Col("v"))]
        )

        def make_q(e):
            return (
                e.scan_table("t")
                .join(e.scan_table("idims"), on=["ts"], how=how)
                .aggregate(aggs, [E.Col("g")])
            )

        generic, _ = _run(db, ExecOptions(compiled_serving=False), make_q)
        fast, path = _run(db, ExecOptions(compiled_serving=True), make_q)
        assert fast == generic, (seed, how, path)
