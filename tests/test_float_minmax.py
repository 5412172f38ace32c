"""Float64 min/max IEEE-edge parity on every fast tier (VERDICT r4 item 5):
-0.0, +-inf, NaN and full-magnitude values order via the monotone int64
key — the same transform the generic engine reduces with
(physical._float_ord_encode) — so compiled(dense)/mesh/shuffle all agree
byte-for-byte, including the -0.0 < +0.0 pair and NaN-largest."""

import numpy as np
import pytest

from frostdb_tpu.columnbatch import (
    Column,
    ColumnBatch,
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
    TYPE_DOUBLE,
    TYPE_INT64,
    TYPE_STRING,
)
from frostdb_tpu.table import TableConfig

EDGE = np.array(
    [
        -0.0,
        0.0,
        1.0,
        -1.0,
        np.inf,
        -np.inf,
        np.nan,
        1e300,
        -1e300,
        5e-324,  # subnormal
        -5e-324,
        1.5,
    ]
)


def _mk_dict_grouped(seed=0, n=4000, groups=7):
    schema = SchemaDef(
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
            ColumnDef("f", StorageLayout(TYPE_DOUBLE, nullable=True)),
        ),
        (SortingColumnDef("g", "asc", True),),
    )
    store = ColumnStore()
    db = store.db("d")
    t = db.table("t", TableConfig(schema=schema))
    dg = t.dictionary("g")
    rng = np.random.default_rng(seed)
    for _ in range(2):
        gc, gv = dg.encode(
            [f"g{int(i)}" for i in rng.integers(0, groups, n)]
        )
        f = EDGE[rng.integers(0, len(EDGE), n)]
        fv = rng.random(n) > 0.1
        t.insert_record(
            ColumnBatch(
                [
                    Column("g", KIND_DICT, gc, gv, dg),
                    Column("f", KIND_FLOAT64, np.where(fv, f, 0.0), fv),
                ],
                n,
            ),
            sort=True,
        )
    t.sync()
    return store, db


def _rows(bs):
    out = []
    for b in bs:
        for i in range(b.num_rows):
            row = []
            for c in b.columns:
                v = c.py_value(i)
                if isinstance(v, float):
                    # distinguish -0.0 / NaN positionally
                    v = repr(v) + ("/neg" if np.signbit(v) else "")
                row.append((c.name, v))
            out.append(tuple(row))
    return out


def _run(db, opts, aggs=None, group="g"):
    eng = LocalEngine(db.table_provider(), exec_options=opts)
    out = []
    eng.scan_table("t").aggregate(
        aggs or [E.Min(E.Col("f")), E.Max(E.Col("f"))], [E.Col(group)]
    ).execute(out.append)
    return _rows(out), eng.last_serving_path, eng.last_fallback_reasons


def test_edge_values_dense_tier():
    store, db = _mk_dict_grouped()
    g, _p, _r = _run(db, ExecOptions(compiled_serving=False))
    f, path, reasons = _run(db, ExecOptions(compiled_serving=True))
    # non-integral float min/max: the int64-native dense tier serves
    assert path == "dense", (path, reasons)
    assert f == g


def test_edge_values_mesh():
    store, db = _mk_dict_grouped(seed=1)
    g, _p, _r = _run(db, ExecOptions(compiled_serving=False))
    for n_dev in (1, 8):
        f, path, reasons = _run(db, ExecOptions(mesh=make_mesh(n_dev)))
        assert path == "mesh", (path, reasons)
        assert f == g


def test_negative_zero_integral_column():
    # Integral floats ride the int path, which would collapse -0.0 to
    # +0.0; the -0.0 escalation must push min/max onto the ordering keys.
    schema = SchemaDef(
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
            ColumnDef("f", StorageLayout(TYPE_DOUBLE, nullable=True)),
        ),
        (SortingColumnDef("g", "asc", True),),
    )
    store = ColumnStore()
    db = store.db("d")
    t = db.table("t", TableConfig(schema=schema))
    dg = t.dictionary("g")
    gc, gv = dg.encode(["a", "a", "b", "b"])
    t.insert_record(
        ColumnBatch(
            [
                Column("g", KIND_DICT, gc, gv, dg),
                Column(
                    "f",
                    KIND_FLOAT64,
                    np.array([-0.0, 1.0, 0.0, 2.0]),
                    np.ones(4, bool),
                ),
            ],
            4,
        ),
        sort=True,
    )
    t.sync()
    g, _p, _r = _run(db, ExecOptions(compiled_serving=False))
    f, path, _r2 = _run(db, ExecOptions(compiled_serving=True))
    assert f == g
    byg = {dict(r)["g"]: dict(r) for r in f}
    assert byg["a"]["min(f)"] == "-0.0/neg"


def _mk_large_k(seed=0, rows=8000, key_space=3_000_000):
    schema = SchemaDef(
        "t",
        (
            ColumnDef("k", StorageLayout(TYPE_INT64)),
            ColumnDef("f", StorageLayout(TYPE_DOUBLE, nullable=True)),
        ),
        (SortingColumnDef("k", "asc", True),),
    )
    store = ColumnStore()
    db = store.db("sh")
    t = db.table("t", TableConfig(schema=schema))
    rng = np.random.default_rng(seed)
    for _ in range(2):
        keys = rng.integers(0, key_space, rows).astype(np.int64)
        f = EDGE[rng.integers(0, len(EDGE), rows)]
        fv = rng.random(rows) > 0.1
        t.insert_record(
            ColumnBatch(
                [
                    Column("k", KIND_INT64, keys, np.ones(rows, bool)),
                    Column("f", KIND_FLOAT64, np.where(fv, f, 0.0), fv),
                ],
                rows,
            )
        )
    return store, db


@pytest.mark.parametrize("n_dev", [1, 8])
def test_shuffle_tier_float_minmax(n_dev):
    # K ~ 3M > 2^20 forces the shuffle tier, which previously declined
    # float min/max entirely (compiled.py:570 gate, VERDICT r4 item 5).
    store, db = _mk_large_k(seed=n_dev)
    g, _p, _r = _run(
        db, ExecOptions(compiled_serving=False), group="k"
    )
    f, path, reasons = _run(
        db, ExecOptions(mesh=make_mesh(n_dev)), group="k"
    )
    assert path == "mesh", (path, reasons)
    assert f == g
