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


# --- float64 min/max on the dense/mesh tiers (monotone int64 transform) ---


def _mkmm(vals_per_part, grps_per_part):
    return _mk(vals_per_part, grps_per_part)


def _minmax(db, compiled=False, mesh=None):
    engine = LocalEngine(
        db.table_provider(),
        ExecOptions(compiled_serving=compiled, mesh=mesh),
    )
    out = []
    engine.scan_table("t").aggregate(
        [E.Min(E.Col("fv")), E.Max(E.Col("fv")), E.Sum(E.Col("fv"))],
        [E.Col("g")],
    ).execute(out.append)
    res = {}
    for b in out:
        for i in range(b.num_rows):
            res[b.column("g").py_value(i)] = (
                float(b.column("min(fv)").values[i]),
                float(b.column("max(fv)").values[i]),
                float(b.column("sum(fv)").values[i]),
            )
    return res, engine.last_serving_path


@pytest.mark.parametrize("seed", [0, 3])
def test_float_minmax_dense_and_mesh_parity(seed):
    """Non-integral float min/max (+ exact sum on the same column) on the
    fast tiers, byte-identical to generic — incl. huge magnitudes whose
    monotone keys exceed the 2^62 reduce identities."""
    rng = np.random.default_rng(seed)
    vpp, gpp = [], []
    for _p in range(2):
        n = 400
        v = rng.normal(0, 1, n) * 10.0 ** rng.integers(-3, 4, n)
        vpp.append(v.tolist())
        gpp.append([f"g{int(x)}" for x in rng.integers(0, 6, n)])
    _s, db, _t = _mkmm(vpp, gpp)
    slow, spath = _minmax(db)
    assert spath == "generic"
    fast, fpath = _minmax(db, compiled=True)
    assert fpath == "dense", fpath
    assert fast == slow
    from frostdb_tpu.parallel.mesh import make_mesh

    for n_dev in (1, 8):
        mesh_res, mpath = _minmax(db, mesh=make_mesh(n_dev))
        assert mpath == "mesh", mpath
        assert mesh_res == slow


def test_float_minmax_huge_magnitudes():
    """Values >= 2.0 transform past 2^62; 1e300 nearly exhausts int64 —
    the lexicographic (hi, lo) path must stay exact. (No sum here: the
    1e300-vs-1e-300 ulp spread correctly fails the exact-sum width gate.)"""
    vpp = [[1e300, -1e300, 2.5, -2.5, 1e-300, 3.75]]
    gpp = [["a", "a", "a", "a", "a", "a"]]
    _s, db, _t = _mkmm(vpp, gpp)

    def mm_only(compiled):
        engine = LocalEngine(
            db.table_provider(), ExecOptions(compiled_serving=compiled)
        )
        out = []
        engine.scan_table("t").aggregate(
            [E.Min(E.Col("fv")), E.Max(E.Col("fv"))], [E.Col("g")]
        ).execute(out.append)
        b = out[0]
        return (
            float(b.column("min(fv)").values[0]),
            float(b.column("max(fv)").values[0]),
        ), engine.last_serving_path

    slow, _ = mm_only(False)
    fast, path = mm_only(True)
    assert path == "dense", path
    assert fast == slow == (-1e300, 1e300)


def test_float_minmax_negzero_serves_dense():
    # -0.0 columns serve the ordering-key tiers since round 5 (the total
    # order matches the generic engine's _float_ord_encode exactly).
    vpp = [[-0.0, 1.5, 2.5]]
    gpp = [["a", "a", "a"]]
    _s, db, _t = _mkmm(vpp, gpp)
    slow, _ = _minmax(db)
    fast, path = _minmax(db, compiled=True)
    assert path == "dense", path
    assert fast == slow


def test_float_minmax_sorted_path_large_k():
    """fmm through the sorted reduce (K > 4096): empty-shard identities
    must widen before the cross-shard combine."""
    from frostdb_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    n = 3000
    vals = (rng.normal(0, 5, n) * 10.0 ** rng.integers(-2, 3, n)).tolist()
    grps = [f"g{int(x)}" for x in rng.integers(0, 6000, n)]
    _s, db, _t = _mkmm([vals], [grps])
    slow, _ = _minmax(db)
    fast, path = _minmax(db, compiled=True)
    assert path == "dense", path
    assert fast == slow
    mesh_res, mpath = _minmax(db, mesh=make_mesh(8))
    assert mpath == "mesh" and mesh_res == slow
