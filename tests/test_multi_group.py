"""Two-column group-bys on the fast paths (VERDICT r2 item 10): the
(example_type, labels.x) Merge-query shape must compile (combined compact
pair-code space) and distribute, byte-identical to the generic engine."""

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
from frostdb_tpu.tracing import Tracer


def _setup(n_parts=3, rows=500, k_et=5, k_l=9, seed=0, with_nulls=False):
    store = ColumnStore()
    db = store.db("mg")
    table = db.table("t", TableConfig(schema=sample_definition()))
    rng = np.random.default_rng(seed)
    for p in range(n_parts):
        n = rows + 17 * p
        d_et = table.dictionary("example_type")
        d_l = table.dictionary("labels")
        et, etv = d_et.encode(
            [f"type{int(x)}" for x in rng.integers(0, k_et, n)]
        )
        lc, lv = d_l.encode([f"g{int(x)}" for x in rng.integers(0, k_l, n)])
        if with_nulls and p == 1:
            lv = lv.copy()
            lv[::7] = False
        table.insert_record(
            ColumnBatch(
                [
                    Column("example_type", KIND_DICT, et, etv, d_et),
                    Column("labels.label1", KIND_DICT, lc, lv, d_l),
                    Column(
                        "timestamp",
                        KIND_INT64,
                        rng.integers(0, 1000, n).astype(np.int64),
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
        )
    return store, db, table


def _rows(batches):
    out = []
    for b in batches:
        for i in range(b.num_rows):
            out.append(
                tuple((c.name, c.py_value(i)) for c in b.columns)
            )
    return out


def _run(db, opts, q_fn, tracer=None):
    if tracer is not None:
        opts.tracer = tracer
    engine = LocalEngine(db.table_provider(), opts)
    out = []
    q_fn(engine.scan_table("t")).execute(out.append)
    return _rows(out)


QUERIES = {
    "pair-sum": lambda q: q.aggregate(
        [E.Sum(E.Col("value")), E.Count(E.Col("value"))],
        [E.Col("example_type"), E.Col("labels.label1")],
    ),
    "pair-reversed": lambda q: q.aggregate(
        [E.Sum(E.Col("value"))],
        [E.Col("labels.label1"), E.Col("example_type")],
    ),
    "pair-filtered": lambda q: q.filter(
        E.And(E.Col("timestamp").gt(200), E.Col("labels.label1").not_eq("g3"))
    ).aggregate(
        [E.Sum(E.Col("value")), E.Min(E.Col("value")), E.Max(E.Col("value"))],
        [E.Col("example_type"), E.Col("labels.label1")],
    ),
    "pair-avg": lambda q: q.aggregate(
        [E.Avg(E.Col("value"))],
        [E.Col("example_type"), E.Col("labels.label1")],
    ),
}


@pytest.mark.parametrize("qname", sorted(QUERIES))
def test_two_column_group_by_compiles_and_distributes(qname):
    store, db, table = _setup()
    q = QUERIES[qname]
    generic = _run(db, ExecOptions(compiled_serving=False), q)
    tracer = Tracer()
    compiled = _run(db, ExecOptions(), q, tracer)
    mesh8 = _run(db, ExecOptions(mesh=make_mesh(8)), q)
    assert generic and compiled == generic and mesh8 == generic
    assert tracer.roots[0].attributes["path"] == "compiled"
    # both group columns are emitted, in plan order
    first = generic[0]
    names = [name for name, _v in first]
    if qname == "pair-reversed":
        assert names[:2] == ["labels.label1", "example_type"]
    elif qname != "pair-avg":
        assert names[:2] == ["example_type", "labels.label1"]


def test_two_column_group_by_null_keys_fall_back():
    """Null keys in either group column emit a null-key group — generic
    engine only; the fast paths must decline and parity must hold."""
    store, db, table = _setup(with_nulls=True)
    q = QUERIES["pair-sum"]
    generic = _run(db, ExecOptions(compiled_serving=False), q)
    tracer = Tracer()
    fast = _run(db, ExecOptions(), q, tracer)
    assert fast == generic
    assert tracer.roots[0].attributes["path"] == "generic"
    assert any(
        v is None for r in generic for name, v in r if name == "labels.label1"
    )


def test_two_column_group_by_dense_tier():
    """A pair space past 2048 (e.g. 60x60) runs on the dense tier."""
    store, db, table = _setup(n_parts=2, rows=4000, k_et=60, k_l=60)
    q = QUERIES["pair-sum"]
    generic = _run(db, ExecOptions(compiled_serving=False), q)
    tracer = Tracer()
    fast = _run(db, ExecOptions(), q, tracer)
    mesh8 = _run(db, ExecOptions(mesh=make_mesh(8)), q)
    assert fast == generic and mesh8 == generic
    assert tracer.roots[0].attributes["path"] == "dense"
    assert len(generic) > 2000


def test_three_column_group_by_falls_back():
    store, db, table = _setup()
    q = lambda b: b.aggregate(
        [E.Sum(E.Col("value"))],
        [E.Col("example_type"), E.Col("labels.label1"), E.Col("stacktrace")],
    )
    tracer = Tracer()
    # stacktrace column absent from the inserted parts -> groups as null
    generic = _run(db, ExecOptions(compiled_serving=False), q)
    fast = _run(db, ExecOptions(), q, tracer)
    assert fast == generic
    assert tracer.roots[0].attributes["path"] == "generic"


def test_three_and_four_group_columns_fast_paths():
    """Round 4: aggregations over 3-4 group columns ride the fast tiers
    (the pair-code machinery generalizes; MAX_CODES still gates)."""
    import numpy as np

    from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
    from frostdb_tpu.db import ColumnStore
    from frostdb_tpu.parallel.mesh import make_mesh
    from frostdb_tpu.query import expr as E
    from frostdb_tpu.query.engine import LocalEngine
    from frostdb_tpu.query.physical import ExecOptions
    from frostdb_tpu.schema import sample_definition
    from frostdb_tpu.table import TableConfig

    store = ColumnStore()
    db = store.db("mg4")
    table = db.table("t", TableConfig(schema=sample_definition()))
    rng = np.random.default_rng(5)
    for _p in range(2):
        n = 500
        d_et = table.dictionary("example_type")
        d_l = table.dictionary("labels")
        d_st = table.dictionary("stacktrace")
        et, etv = d_et.encode(rng.choice(["a", "b", "c"], n).tolist())
        l1, l1v = d_l.encode([f"x{int(i)}" for i in rng.integers(0, 4, n)])
        st, stv = d_st.encode([f"s{int(i)}" for i in rng.integers(0, 5, n)])
        table.insert_record(
            ColumnBatch(
                [
                    Column("example_type", KIND_DICT, et, etv, d_et),
                    Column("labels.l1", KIND_DICT, l1, l1v, d_l),
                    Column("stacktrace", KIND_DICT, st, stv, d_st),
                    Column(
                        "timestamp",
                        KIND_INT64,
                        rng.integers(0, 8, n).astype(np.int64),
                        np.ones(n, bool),
                    ),
                    Column(
                        "value",
                        KIND_INT64,
                        rng.integers(-50, 50, n).astype(np.int64),
                        np.ones(n, bool),
                    ),
                ],
                n,
            )
        )

    def run(opts, groups):
        eng = LocalEngine(db.table_provider(), opts)
        out = []
        eng.scan_table("t").aggregate(
            [E.Sum(E.Col("value")), E.Count(E.Col("value"))], groups
        ).execute(out.append)
        return [
            tuple((c.name, c.py_value(i)) for c in b.columns)
            for b in out
            for i in range(b.num_rows)
        ], eng.last_serving_path

    for groups in (
        [E.Col("example_type"), E.Col("labels.l1"), E.Col("stacktrace")],
        [
            E.Col("example_type"),
            E.Col("labels.l1"),
            E.Col("stacktrace"),
            E.Col("timestamp"),
        ],
        [E.Col("example_type"), E.Duration(4), E.Col("labels.l1")],
    ):
        slow, spath = run(ExecOptions(compiled_serving=False), groups)
        assert spath == "generic"
        fast, fpath = run(ExecOptions(), groups)
        assert fpath in ("compiled", "dense"), (fpath,)
        assert fast == slow
        mesh, mpath = run(ExecOptions(mesh=make_mesh(8)), groups)
        assert mpath == "mesh"
        assert mesh == slow
