"""Widened compiled-filter envelope: AND conjunctions and dict/string
predicates must stay byte-identical to the generic operator pipeline
(including missing-dynamic-column semantics, null handling, and group
emission order), and provably-empty parts must be skipped before any
device work."""

import numpy as np
import pytest

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.compiled import NotCompilable, compile_filter_aggregate
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.query.physical import ExecOptions
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.table import TableConfig
from frostdb_tpu.tracing import Tracer


def _mk(parts, db_name="f"):
    """parts: list of dicts with keys types, ts, and optional job
    (list of str/None — None means a null slot; key absent means the part
    lacks the labels.job column entirely)."""
    store = ColumnStore()
    db = store.db(db_name)
    table = db.table("t", TableConfig(schema=sample_definition()))
    d_et = table.dictionary("example_type")
    d_l = table.dictionary("labels")
    for spec in parts:
        types = spec["types"]
        n = len(types)
        et, etv = d_et.encode(types)
        cols = [
            Column("example_type", KIND_DICT, et, etv, d_et),
            Column(
                "timestamp",
                KIND_INT64,
                np.asarray(spec["ts"], dtype=np.int64),
                np.ones(n, dtype=bool),
            ),
            Column(
                "value",
                KIND_INT64,
                np.arange(1, n + 1, dtype=np.int64),
                np.ones(n, dtype=bool),
            ),
        ]
        if "job" in spec:
            jobs = spec["job"]
            codes, valid = d_l.encode([j if j is not None else "" for j in jobs])
            valid = np.asarray([j is not None for j in jobs], dtype=bool)
            codes = np.where(valid, codes, 0).astype(codes.dtype)
            cols.append(Column("labels.job", KIND_DICT, codes, valid, d_l))
        table.insert_record(ColumnBatch(cols, n))
    return store, db, table


def _rows(batches):
    rows = []
    for b in batches:
        for i in range(b.num_rows):
            rows.append(tuple((c.name, c.py_value(i)) for c in b.columns))
    return rows


def _run(db, compiled, filt, tracer=None):
    engine = LocalEngine(
        db.table_provider(),
        ExecOptions(compiled_serving=compiled, tracer=tracer),
    )
    q = engine.scan_table("t")
    if filt is not None:
        q = q.filter(filt)
    out = []
    q.aggregate(
        [E.Sum(E.Col("value")), E.Count(E.Col("value"))],
        [E.Col("example_type")],
    ).execute(out.append)
    return out


def _assert_parity(db, filt, expect_compiled=True):
    tracer = Tracer()
    fast = _run(db, True, filt, tracer)
    slow = _run(db, False, filt)
    assert _rows(fast) == _rows(slow)
    if expect_compiled:
        assert tracer.roots[0].attributes["path"] == "compiled"
    return fast


_PARTS = [
    # newest part scanned first (LSM order); mixed jobs incl. nulls
    {
        "types": ["a", "b", "a", "c"],
        "ts": [10, 60, 80, 95],
        "job": ["api", "web", None, "api"],
    },
    # part lacking labels.job entirely (missing dynamic column)
    {"types": ["b", "d", "a"], "ts": [5, 70, 99]},
    # part whose jobs never match "api" (prunable for eq filters)
    {
        "types": ["c", "c", "e"],
        "ts": [50, 55, 65],
        "job": ["batch", "batch", "cron"],
    },
]


def test_and_conjunction_parity():
    _s, db, _t = _mk([dict(p) for p in _PARTS])
    filt = E.And(E.Col("timestamp").gt_eq(50), E.Col("timestamp").lt(95))
    out = _assert_parity(db, filt)
    assert sum(b.num_rows for b in out) > 0


def test_triple_conjunction_parity():
    _s, db, _t = _mk([dict(p) for p in _PARTS])
    filt = E.And(
        E.Col("timestamp").gt(0),
        E.Col("timestamp").lt_eq(99),
        E.Col("value").not_eq(2),
    )
    _assert_parity(db, filt)


@pytest.mark.parametrize(
    "mk_filt",
    [
        lambda: E.Col("labels.job").eq("api"),
        lambda: E.Col("labels.job").not_eq("api"),
        lambda: E.Col("labels.job").eq("missing-everywhere"),
        lambda: E.Col("labels.job").eq(""),  # missing column matches
        lambda: E.Col("labels.job").eq(None),  # null slots only
        lambda: E.Col("labels.job").not_eq(None),
        lambda: E.Col("labels.job").regex_match("^a"),
        lambda: E.Col("labels.job").regex_not_match("^a"),
        lambda: E.Col("labels.job").regex_match(""),  # empty rx matches all
        lambda: E.Col("labels.job").contains("at"),
        lambda: E.Col("labels.job").not_contains("at"),
        lambda: E.Col("labels.job").lt("c"),
        lambda: E.Col("labels.job").gt_eq("b"),
    ],
)
def test_dict_filter_parity(mk_filt):
    _s, db, _t = _mk([dict(p) for p in _PARTS])
    _assert_parity(db, mk_filt())


def test_parca_merge_shape_parity():
    """The reference's Merge/Range query shape (bench_test.go:299):
    label equality AND a timestamp range, summed per group."""
    _s, db, _t = _mk([dict(p) for p in _PARTS])
    filt = E.And(
        E.Col("labels.job").eq("api"),
        E.Col("timestamp").gt_eq(10),
        E.Col("timestamp").lt(96),
    )
    _assert_parity(db, filt)


def test_int_filter_with_nulls_parity():
    store = ColumnStore()
    db = store.db("n")
    table = db.table("t", TableConfig(schema=sample_definition()))
    d_et = table.dictionary("example_type")
    et, etv = d_et.encode(["a", "b", "a", "b"])
    ts = np.asarray([10, 60, 80, 95], dtype=np.int64)
    tvalid = np.asarray([True, False, True, False])
    table.insert_record(
        ColumnBatch(
            [
                Column("example_type", KIND_DICT, et, etv, d_et),
                Column("timestamp", KIND_INT64, ts, tvalid),
                Column(
                    "value",
                    KIND_INT64,
                    np.arange(1, 5, dtype=np.int64),
                    np.ones(4, dtype=bool),
                ),
            ],
            4,
        )
    )
    # nulls never match a comparison (generic: cmp & validity)
    _assert_parity(db, E.Col("timestamp").gt_eq(0))
    _assert_parity(db, E.Col("timestamp").not_eq(10))


def test_pruned_parts_never_touch_the_device(monkeypatch):
    """A part whose code-presence set can't satisfy the dict filter must be
    skipped before any device upload (the reference's TrueNegativeFilter
    row-group skip, store.go:243)."""
    from frostdb_tpu.lsm import Part

    _s, db, table = _mk([dict(p) for p in _PARTS], db_name="p")
    touched = []
    orig = Part.device

    def spy(self):
        touched.append(self)
        return orig(self)

    monkeypatch.setattr(Part, "device", spy)
    q = compile_filter_aggregate(
        table,
        "example_type",
        [("sum", "value"), ("count", "value")],
        filter=("labels.job", E.OP_EQ, "api"),
    )
    q.execute()
    # parts 2 (no labels.job -> eq 'api' statically false) and 3 (presence
    # set {batch, cron}) must both be skipped: only part 1 is uploaded.
    assert len({id(p) for p in touched}) == 1


def test_direct_api_list_filter_matches_engine():
    _s, db, table = _mk([dict(p) for p in _PARTS], db_name="d")
    q = compile_filter_aggregate(
        table,
        "example_type",
        [("sum", "value"), ("count", "value")],
        filter=[
            ("labels.job", E.OP_NOT_EQ, "batch"),
            ("timestamp", ">=", 10),
        ],
    )
    got = _rows([q.execute()])
    filt = E.And(E.Col("labels.job").not_eq("batch"), E.Col("timestamp").gt_eq(10))
    expect = _rows(_run(db, False, filt))
    assert got == expect


# --- OR / IN predicates in the fused envelope (VERDICT r3 item 3;
# reference filter.go:196-229 OrExpr) -----------------------------------

_OR_FILTERS = [
    # same-column int OR (range union)
    E.Or(E.Col("timestamp").lt(20), E.Col("timestamp").gt(90)),
    # same-column dict OR — the IN (a, b) shape folds into LUT unions
    E.Or(E.Col("labels.job").eq("api"), E.Col("labels.job").eq("web")),
    # three-way IN
    E.Or(
        E.Col("labels.job").eq("api"),
        E.Col("labels.job").eq("web"),
        E.Col("labels.job").eq("cron"),
    ),
    # cross-column OR (dict vs int)
    E.Or(E.Col("labels.job").eq("batch"), E.Col("timestamp").gt_eq(95)),
    # OR with a null literal branch
    E.Or(E.Col("labels.job").eq(None), E.Col("timestamp").lt(7)),
    # AND of (leaf, OR clause) — CNF
    E.And(
        E.Col("timestamp").gt_eq(10),
        E.Or(E.Col("labels.job").eq("api"), E.Col("labels.job").eq("cron")),
    ),
    # two OR clauses ANDed
    E.And(
        E.Or(E.Col("timestamp").lt(60), E.Col("timestamp").gt(94)),
        E.Or(
            E.Col("labels.job").not_eq("batch"),
            E.Col("example_type").eq("c"),
        ),
    ),
    # regex branch in an OR
    E.Or(
        E.Col("labels.job").regex_match("^a"),
        E.Col("example_type").eq("d"),
    ),
]


@pytest.mark.parametrize("i", range(len(_OR_FILTERS)))
def test_or_filters_compile_with_parity(i):
    _s, db, _t = _mk([dict(p) for p in _PARTS], db_name=f"or{i}")
    _assert_parity(db, _OR_FILTERS[i])


@pytest.mark.parametrize("i", range(len(_OR_FILTERS)))
@pytest.mark.parametrize("n_dev", [1, 8])
def test_or_filters_mesh_parity(i, n_dev):
    from frostdb_tpu.parallel.mesh import make_mesh

    _s, db, _t = _mk([dict(p) for p in _PARTS], db_name=f"orm{i}{n_dev}")
    engine = LocalEngine(
        db.table_provider(), ExecOptions(mesh=make_mesh(n_dev))
    )
    out = []
    engine.scan_table("t").filter(_OR_FILTERS[i]).aggregate(
        [E.Sum(E.Col("value")), E.Count(E.Col("value"))],
        [E.Col("example_type")],
    ).execute(out.append)
    assert engine.last_serving_path == "mesh"
    slow = _run(db, False, _OR_FILTERS[i])
    assert _rows(out) == _rows(slow)


def test_or_pruning_is_sound():
    """A part is pruned only when EVERY branch proves empty; one live
    branch keeps it scanned (lsm.prune_part OR semantics)."""
    _s, db, table = _mk([dict(p) for p in _PARTS], db_name="orp")
    # both branches provably miss part 3 ("batch"/"cron" jobs, ts 50-65):
    filt_prunable = E.Or(
        E.Col("labels.job").eq("api"), E.Col("timestamp").gt(90)
    )
    # jobs never match but the ts branch hits part 3 -> must NOT prune
    filt_live = E.Or(
        E.Col("labels.job").eq("api"), E.Col("timestamp").gt_eq(50)
    )
    from frostdb_tpu.compiled import lower_plan
    from frostdb_tpu.query.logical import Builder

    for filt, pruned_expected in ((filt_prunable, True), (filt_live, False)):
        plan = Builder().scan(db.table_provider(), "t").filter(filt).aggregate(
            [E.Sum(E.Col("value"))], [E.Col("example_type")]
        ).build()
        from frostdb_tpu.query.optimize import optimize

        q = lower_plan(optimize(plan))
        parts = table.collect_parts(2**63)
        kept = q._filter_parts(parts)
        batch_part = [
            p for p in parts if set(np.asarray(p.batch.column("timestamp").values))
            == {50, 55, 65}
        ]
        assert batch_part
        if pruned_expected:
            assert batch_part[0] not in kept
        else:
            assert batch_part[0] in kept
        _assert_parity(db, filt)


def test_and_inside_or_falls_back():
    """AND under OR is not CNF — the generic engine serves it."""
    _s, db, _t = _mk([dict(p) for p in _PARTS], db_name="ornf")
    filt = E.Or(
        E.And(E.Col("timestamp").lt(60), E.Col("example_type").eq("a")),
        E.Col("timestamp").gt(90),
    )
    tracer = Tracer()
    fast = _run(db, True, filt, tracer)
    slow = _run(db, False, filt)
    assert _rows(fast) == _rows(slow)
    assert tracer.roots[0].attributes["path"] == "generic"


def test_invalid_regex_literal_falls_back():
    """An invalid regex literal must raise NotCompilable (not re.error) so
    the generic engine keeps its semantics: with AND short-circuiting it can
    complete the query without ever compiling the bad pattern
    (filter.go:174), and a part lacking the column resolves statically."""
    _s, db, _t = _mk([dict(p) for p in _PARTS], db_name="rx")
    # left conjunct is all-false -> generic short-circuits and answers
    filt = E.And(
        E.Col("timestamp").lt(-1), E.Col("labels.job").regex_match("(")
    )
    fast = _run(db, True, filt)
    slow = _run(db, False, filt)
    assert _rows(fast) == _rows(slow) == []
    # when the bad regex WOULD have to be evaluated, both paths surface the
    # same user-visible error (the compiled path falls back; the generic
    # engine raises from _dict_mask)
    import re

    for compiled in (True, False):
        with pytest.raises(re.error):
            _run(db, compiled, E.Col("labels.job").regex_match("("))
    # direct API: NotCompilable, never re.error
    q = compile_filter_aggregate(
        db.get_table("t"),
        "example_type",
        [("sum", "value")],
        filter=("labels.job", E.OP_REGEX_MATCH, "("),
    )
    with pytest.raises(NotCompilable):
        q.execute()


def test_non_str_literal_on_dict_column_falls_back():
    _s, _db, table = _mk([dict(p) for p in _PARTS], db_name="x")
    with pytest.raises(NotCompilable):
        compile_filter_aggregate(
            table,
            "example_type",
            [("sum", "value")],
            filter=("labels.job", E.OP_EQ, 7),
        )


def test_wide_int_filter_column_stays_compiled():
    """Filter columns compare at full int64 width (the selection mask is
    XLA-computed; only value planes have the int32 kernel envelope)."""
    store = ColumnStore()
    db = store.db("w")
    table = db.table("t", TableConfig(schema=sample_definition()))
    d_et = table.dictionary("example_type")
    rng = np.random.default_rng(3)
    n = 5000
    et, etv = d_et.encode([f"t{int(x)}" for x in rng.integers(0, 5, n)])
    wide = rng.integers(-(10**15), 10**15, n).astype(np.int64)
    table.insert_record(
        ColumnBatch(
            [
                Column("example_type", KIND_DICT, et, etv, d_et),
                Column("timestamp", KIND_INT64, wide, np.ones(n, dtype=bool)),
                Column(
                    "value",
                    KIND_INT64,
                    rng.integers(0, 100, n).astype(np.int64),
                    np.ones(n, dtype=bool),
                ),
            ],
            n,
        )
    )
    _assert_parity(db, E.Col("timestamp").gt_eq(-(10**14)))
    _assert_parity(db, E.Col("timestamp").not_eq(int(wide[0])))


def test_boundary_literal_comparisons():
    """regression (round-5 review): >= INT32_MIN / <= INT32_MAX literals
    fell through the in-kernel-compare gate into the ==/!= evaluator and
    crashed with KeyError instead of serving via the general mask path."""
    _s, db, _t = _mk(
        [{"types": ["cpu", "mem", "cpu", "io"] * 20, "ts": list(range(80))}]
    )
    for filt in (
        E.Col("timestamp").gt_eq(-(2**31)),
        E.Col("timestamp").lt_eq(2**31 - 1),
    ):
        _assert_parity(db, filt)
