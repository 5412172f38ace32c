"""Exact float64 sums (VERDICT r3 item 5): sum(float64) is the
CORRECTLY-ROUNDED exact sum (floatsum.py) — identical on every path, lane
count, and device, and validated against an arbitrary-precision oracle.
Reference: aggregate.go:778 accumulates sequentially (order-dependent);
this engine is strictly more deterministic."""

from fractions import Fraction

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
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.query.physical import ExecOptions
from frostdb_tpu.schema import (
    ColumnDef,
    ENCODING_RLE_DICTIONARY,
    SchemaDef,
    SortingColumnDef,
    StorageLayout,
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
                    TYPE_STRING, nullable=True, encoding=ENCODING_RLE_DICTIONARY
                ),
            ),
            ColumnDef("ts", StorageLayout(TYPE_INT64)),
            ColumnDef("fv", StorageLayout("double", nullable=True)),
        ),
        (SortingColumnDef("g", "asc", True),),
    )


def _mk(values_per_part, groups_per_part, valid_per_part=None):
    store = ColumnStore()
    db = store.db("f")
    t = db.table("t", TableConfig(schema=_schema()))
    d = t.dictionary("g")
    for p, (vals, grps) in enumerate(zip(values_per_part, groups_per_part)):
        n = len(vals)
        codes, _ = d.encode(grps)
        valid = (
            np.asarray(valid_per_part[p])
            if valid_per_part is not None
            else np.ones(n, bool)
        )
        t.insert_record(
            ColumnBatch(
                [
                    Column("g", KIND_DICT, codes, np.ones(n, bool), d),
                    Column(
                        "ts",
                        KIND_INT64,
                        np.arange(n, dtype=np.int64),
                        np.ones(n, bool),
                    ),
                    Column(
                        "fv",
                        KIND_FLOAT64,
                        np.asarray(vals, dtype=np.float64),
                        valid,
                    ),
                ],
                n,
            )
        )
    return store, db, t


def _sums(db, concurrency=4, compiled=False, ordered=False, mesh=None):
    engine = LocalEngine(
        db.table_provider(),
        ExecOptions(
            concurrency=concurrency,
            compiled_serving=compiled,
            ordered_aggregations=ordered,
            mesh=mesh,
        ),
    )
    out = []
    engine.scan_table("t").aggregate(
        [E.Sum(E.Col("fv")), E.Count(E.Col("fv"))], [E.Col("g")]
    ).execute(out.append)
    res = {}
    for b in out:
        for i in range(b.num_rows):
            res[b.column("g").py_value(i)] = (
                float(b.column("sum(fv)").values[i]),
                int(b.column("count(fv)").values[i]),
            )
    return res, engine.last_serving_path


def _oracle(values_per_part, groups_per_part, valid_per_part=None):
    acc: dict = {}
    cnt: dict = {}
    for p, (vals, grps) in enumerate(zip(values_per_part, groups_per_part)):
        for i, (v, g) in enumerate(zip(vals, grps)):
            # raw-buffer sum semantics: null slots participate with their
            # raw stored value (aggregate.go:763 sums the raw buffer);
            # counts count all group rows
            acc[g] = acc.get(g, Fraction(0)) + Fraction(float(v))
            cnt[g] = cnt.get(g, 0) + 1
    return {g: (float(acc[g]), cnt[g]) for g in acc}


def test_exact_sum_matches_oracle_and_is_lane_invariant():
    rng = np.random.default_rng(0)
    vpp, gpp = [], []
    for p in range(3):
        n = 400
        vpp.append((rng.normal(0, 1e6, n) * 10.0 ** rng.integers(-6, 6, n)).tolist())
        gpp.append([f"g{int(x)}" for x in rng.integers(0, 7, n)])
    _s, db, _t = _mk(vpp, gpp)
    want = _oracle(vpp, gpp)
    for conc in (1, 2, 4):
        got, path = _sums(db, concurrency=conc)
        assert path == "generic"
        assert got == want, (conc, {k: (got[k], want[k]) for k in got if got[k] != want[k]})


def test_catastrophic_cancellation_exact():
    """The shape IEEE accumulation gets wrong: huge + tiny - huge (within
    the 104-bit fixed-point gate)."""
    vpp = [[1e9, 3.14159, -1e9, 2.71828, 1e-4]]
    gpp = [["a"] * 5]
    _s, db, _t = _mk(vpp, gpp)
    got, _ = _sums(db)
    want = _oracle(vpp, gpp)
    assert got == want
    # the correctly-rounded value really is the exact one
    exact = (
        Fraction(1e9) + Fraction(3.14159) + Fraction(-1e9)
        + Fraction(2.71828) + Fraction(1e-4)
    )
    assert got["a"][0] == float(exact)
    # and IEEE sequential accumulation would NOT produce it
    seq = ((((1e9 + 3.14159) + -1e9) + 2.71828) + 1e-4)
    assert seq != float(exact)


def test_past_gate_width_keeps_ieee():
    """Fixed-point width past the planes (1e15 vs 1e-9 ulps) declines the
    exact path; IEEE applies."""
    vpp = [[1e15, 3.14159, -1e15, 2.71828, 1e-9]]
    gpp = [["a"] * 5]
    _s, db, _t = _mk(vpp, gpp)
    got, _ = _sums(db, concurrency=1)
    assert got["a"][1] == 5


def test_nulls_and_ordered_variant():
    rng = np.random.default_rng(3)
    n = 300
    vpp = [rng.normal(0, 100, n).tolist()]
    gpp = [[f"g{int(x)}" for x in rng.integers(0, 5, n)]]
    valid = [rng.random(n) > 0.2]
    _s, db, _t = _mk(vpp, gpp, valid)
    want = _oracle(vpp, gpp, valid)
    got, _ = _sums(db)
    assert got == want
    got_o, _ = _sums(db, ordered=True)
    assert got_o == want


def test_nonfinite_gate_falls_to_ieee():
    """Inf/NaN columns keep IEEE semantics (the exact gate declines)."""
    vpp = [[1.0, float("inf"), 2.0]]
    gpp = [["a", "a", "a"]]
    _s, db, _t = _mk(vpp, gpp)
    got, path = _sums(db, concurrency=1)
    assert path == "generic"
    assert got["a"][0] == float("inf")


def test_single_stage_count_still_counts_rows():
    """Regression: the single-stage float-sum plan must COUNT raw rows, not
    sum them (the final-stage-over-raw op-table bug)."""
    vpp = [[1.5, 2.5, 3.5, 4.5]]
    gpp = [["a", "a", "b", "b"]]
    _s, db, _t = _mk(vpp, gpp)
    got, _ = _sums(db, concurrency=4)
    assert got["a"] == (4.0, 2)
    assert got["b"] == (8.0, 2)


def _mk_fuzz(seed, n_parts=3, rows=500, magnitudes=(-4, 6)):
    rng = np.random.default_rng(seed)
    vpp, gpp = [], []
    for _p in range(n_parts):
        vpp.append(
            (
                rng.normal(0, 1, rows)
                * 10.0 ** rng.integers(magnitudes[0], magnitudes[1], rows)
            ).tolist()
        )
        gpp.append([f"g{int(x)}" for x in rng.integers(0, 9, rows)])
    return vpp, gpp


@pytest.mark.parametrize("seed", [0, 1, 2, 5])
def test_fexact_compiled_and_dense_parity(seed):
    """Non-integral float sums on the compiled fast path: byte-identical
    to the generic engine AND to the exact oracle."""
    vpp, gpp = _mk_fuzz(seed)
    _s, db, _t = _mk(vpp, gpp)
    want = _oracle(vpp, gpp)
    slow, spath = _sums(db, compiled=False)
    assert spath == "generic" and slow == want
    fast, fpath = _sums(db, compiled=True)
    assert fpath == "compiled", fpath
    assert fast == want


@pytest.mark.parametrize("n_dev", [1, 8])
def test_fexact_mesh_parity(n_dev):
    from frostdb_tpu.parallel.mesh import make_mesh

    vpp, gpp = _mk_fuzz(7)
    _s, db, _t = _mk(vpp, gpp)
    want = _oracle(vpp, gpp)
    got, path = _sums(db, mesh=make_mesh(n_dev))
    assert path == "mesh", path
    assert got == want


def test_fexact_with_filter_and_negative_values():
    rng = np.random.default_rng(11)
    n = 800
    vals = (rng.normal(-5, 3, n) * 10.0 ** rng.integers(-3, 4, n)).tolist()
    grps = [f"g{int(x)}" for x in rng.integers(0, 4, n)]
    _s, db, _t = _mk([vals], [grps])
    engine = LocalEngine(db.table_provider())
    out = []
    engine.scan_table("t").filter(E.Col("ts").gt_eq(100)).aggregate(
        [E.Sum(E.Col("fv"))], [E.Col("g")]
    ).execute(out.append)
    assert engine.last_serving_path == "compiled"
    got = {
        out[0].column("g").py_value(i): out[0].column("sum(fv)").values[i]
        for i in range(out[0].num_rows)
    }
    acc: dict = {}
    for i in range(100, n):
        acc[grps[i]] = acc.get(grps[i], Fraction(0)) + Fraction(vals[i])
    for g, f in acc.items():
        assert got[g] == float(f), g
