"""Shuffle-based aggregation tier for K > 2^20 (VERDICT r3 item 6): past
the replicated-[K] ceiling, group-bys execute via local sparse reduce +
all_to_all pair exchange + owner-sharded dense tables of O(K/shards)
per-shard memory (the distributed role of aggregate.go:430-470's overflow
splitting). Byte-identical to the generic engine, including emission
order."""

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
    SchemaDef,
    SortingColumnDef,
    StorageLayout,
    TYPE_INT64,
)
from frostdb_tpu.table import TableConfig


def _mk(n_parts=2, rows=8000, key_space=3_000_000, seed=0, float_vals=False):
    cols = [
        ColumnDef("k", StorageLayout(TYPE_INT64)),
        ColumnDef(
            "v",
            StorageLayout("double" if float_vals else TYPE_INT64, nullable=True),
        ),
    ]
    schema = SchemaDef("t", tuple(cols), (SortingColumnDef("k", "asc", True),))
    store = ColumnStore()
    db = store.db("sh")
    t = db.table("t", TableConfig(schema=schema))
    rng = np.random.default_rng(seed)
    for _p in range(n_parts):
        keys = rng.integers(0, key_space, rows).astype(np.int64)
        if float_vals:
            vals = rng.normal(0, 100, rows) * 10.0 ** rng.integers(-3, 3, rows)
            vcol = Column("v", KIND_FLOAT64, vals, np.ones(rows, bool))
        else:
            vcol = Column(
                "v",
                KIND_INT64,
                rng.integers(-50, 50, rows).astype(np.int64),
                np.ones(rows, bool),
            )
        t.insert_record(
            ColumnBatch(
                [
                    Column("k", KIND_INT64, keys, np.ones(rows, bool)),
                    vcol,
                ],
                rows,
            )
        )
    return store, db, t


def _run(db, compiled=False, mesh=None, aggs=None, filt=None):
    eng = LocalEngine(
        db.table_provider(),
        ExecOptions(compiled_serving=compiled, mesh=mesh),
    )
    q = eng.scan_table("t")
    if filt is not None:
        q = q.filter(filt)
    out = []
    q.aggregate(
        aggs
        or [
            E.Sum(E.Col("v")),
            E.Count(E.Col("v")),
            E.Min(E.Col("v")),
            E.Max(E.Col("v")),
        ],
        [E.Col("k")],
    ).execute(out.append)
    rows = [
        tuple((c.name, c.py_value(i)) for c in b.columns)
        for b in out
        for i in range(b.num_rows)
    ]
    return rows, eng.last_serving_path


def test_dense_tier_large_k_parity():
    """Single-chip (trivial mesh) shuffle tier: K ~ 3M > 2^20."""
    _s, db, _t = _mk()
    slow, _ = _run(db)
    fast, path = _run(db, compiled=True)
    assert path == "dense", path
    assert fast == slow
    assert len(slow) > 10000


@pytest.mark.parametrize("n_dev", [1, 8])
def test_mesh_tier_large_k_parity(n_dev):
    _s, db, _t = _mk(seed=3)
    slow, _ = _run(db)
    fast, path = _run(db, mesh=make_mesh(n_dev))
    assert path == "mesh", path
    assert fast == slow


def test_per_shard_memory_is_k_over_shards(monkeypatch):
    """The owner tables are [K/shards] per shard, never replicated [K]."""
    import frostdb_tpu.parallel.mesh_exec as ME

    captured = {}
    orig = ME.MeshFilterAggregate._shuffle_program

    def spy(self, sig, num_codes, k_per, cap):
        captured["num_codes"] = num_codes
        captured["k_per"] = k_per
        return orig(self, sig, num_codes, k_per, cap)

    monkeypatch.setattr(ME.MeshFilterAggregate, "_shuffle_program", spy)
    _s, db, _t = _mk(seed=4)
    slow, _ = _run(db)
    fast, path = _run(db, mesh=make_mesh(8))
    assert path == "mesh" and fast == slow
    assert captured["num_codes"] > 1 << 20
    assert captured["k_per"] <= -(-captured["num_codes"] // 8) + 128


def test_shuffle_tier_filter_and_floats():
    _s, db, _t = _mk(seed=5, float_vals=True)
    filt = E.Col("k").gt_eq(1000)
    aggs = [E.Sum(E.Col("v")), E.Count(E.Col("v"))]
    slow, _ = _run(db, aggs=aggs, filt=filt)
    fast, path = _run(db, compiled=True, aggs=aggs, filt=filt)
    assert path == "dense", path
    assert fast == slow
    mesh_rows, mpath = _run(db, mesh=make_mesh(8), aggs=aggs, filt=filt)
    assert mpath == "mesh" and mesh_rows == slow


def test_overflow_escalation(monkeypatch):
    """An undersized pair-exchange bucket escalates oversubscription and
    still returns exact results."""
    # Skew every key to one destination (all keys congruent mod 8) so the
    # first capacity attempt overflows on an 8-shard mesh.
    cols = [
        ColumnDef("k", StorageLayout(TYPE_INT64)),
        ColumnDef("v", StorageLayout(TYPE_INT64, nullable=True)),
    ]
    schema = SchemaDef("t", tuple(cols), (SortingColumnDef("k", "asc", True),))
    store = ColumnStore()
    db = store.db("ov")
    t = db.table("t", TableConfig(schema=schema))
    rng = np.random.default_rng(7)
    n = 9000
    keys = (rng.integers(0, 400_000, n).astype(np.int64) * 8) % 3_000_000
    t.insert_record(
        ColumnBatch(
            [
                Column("k", KIND_INT64, keys, np.ones(n, bool)),
                Column(
                    "v",
                    KIND_INT64,
                    rng.integers(0, 10, n).astype(np.int64),
                    np.ones(n, bool),
                ),
            ],
            n,
        )
    )
    slow, _ = _run(db)
    fast, path = _run(db, mesh=make_mesh(8))
    assert path == "mesh" and fast == slow


def test_beyond_shuffle_ceiling_falls_generic():
    _s, db, _t = _mk(rows=200, key_space=1 << 40)
    fast, path = _run(db, compiled=True)
    assert path == "generic"
