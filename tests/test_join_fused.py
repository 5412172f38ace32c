"""Join->aggregate fusion (compiled_join.py): the groupjoin decomposition
must be byte-identical to the generic HashJoin -> HashAggregate pipeline
(reference parity anchor: the two-phase aggregation contract of
query/physicalplan/aggregate.go:124 applied to the north-star join,
SURVEY.md §2.8) while serving from the fused device kernels."""

import numpy as np
import pytest

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.schema import (
    ColumnDef,
    ENCODING_RLE_DICTIONARY,
    SchemaDef,
    SortingColumnDef,
    StorageLayout,
    TYPE_INT64,
    TYPE_STRING,
    sample_definition,
)
from frostdb_tpu.table import TableConfig


def _dims_schema(extra_int_cols=("weight",)):
    cols = [
        ColumnDef(
            "labels.node",
            StorageLayout(
                TYPE_STRING, nullable=True, encoding=ENCODING_RLE_DICTIONARY
            ),
        )
    ]
    for c in extra_int_cols:
        cols.append(ColumnDef(c, StorageLayout(TYPE_INT64, nullable=True)))
    return SchemaDef(
        "dims", tuple(cols), (SortingColumnDef("labels.node", "asc", True),)
    )


def build_db(
    seed=7,
    n_parts=3,
    n_per_part=4000,
    null_keys=True,
    dup_dims=True,
    value_scale=1000,
    weight_lo=-100,
):
    store = ColumnStore()
    db = store.db("t")
    table = db.table("stacktraces", TableConfig(schema=sample_definition()))
    d_l = table.dictionary("labels")
    rng = np.random.default_rng(seed)
    for _ in range(n_parts):
        n = n_per_part
        node, nodev = d_l.encode([f"n{int(i)}" for i in rng.integers(0, 40, n)])
        if null_keys:
            nodev = nodev & (rng.random(n) > 0.05)
            node = np.where(nodev, node, 0)
        table.insert_record(
            ColumnBatch(
                [
                    Column("labels.node", KIND_DICT, node, nodev, d_l),
                    Column(
                        "timestamp",
                        KIND_INT64,
                        rng.integers(0, 1000, n).astype(np.int64),
                        np.ones(n, bool),
                    ),
                    Column(
                        "value",
                        KIND_INT64,
                        rng.integers(-value_scale, value_scale, n).astype(
                            np.int64
                        ),
                        rng.random(n) > 0.1,
                    ),
                ],
                n,
            ),
            sort=True,
        )
    table.sync()

    dims = db.table("dims", TableConfig(schema=_dims_schema()))
    d_dim = dims.dictionary("labels")
    vals = [f"n{i}" for i in range(0, 40, 2)]
    if dup_dims:
        vals += ["n3", "n3", "n2"]  # multi-match keys
    codes, _ = d_dim.encode(vals)
    m = len(codes)
    wvalid = rng.random(m) > 0.15
    dims.insert_record(
        ColumnBatch(
            [
                Column(
                    "labels.node", KIND_DICT, codes, np.ones(m, bool), d_dim
                ),
                Column(
                    "weight",
                    KIND_INT64,
                    np.where(
                        wvalid,
                        rng.integers(weight_lo, 100, m).astype(np.int64),
                        0,
                    ),
                    wvalid,
                ),
            ],
            m,
        )
    )
    return store, db


def rows(bs):
    out = []
    for b in bs:
        for i in range(b.num_rows):
            row = []
            for c in b.columns:
                if c.kind == KIND_DICT:
                    row.append(
                        (
                            c.name,
                            c.dictionary.value_array()[c.values[i]]
                            if c.validity[i]
                            else None,
                        )
                    )
                else:
                    row.append(
                        (c.name, c.values[i] if c.validity[i] else None)
                    )
            out.append(tuple(row))
    return out


def run_both(db, make_q, expect_path="compiled_join"):
    fused_engine = LocalEngine(db.table_provider())
    generic_engine = LocalEngine(db.table_provider())
    generic_engine.exec_options.compiled_serving = False
    a, b = [], []
    make_q(fused_engine).execute(a.append)
    make_q(generic_engine).execute(b.append)
    if expect_path is not None:
        assert fused_engine.last_serving_path == expect_path, (
            fused_engine.last_serving_path,
            fused_engine.last_fallback_reasons,
        )
    assert rows(a) == rows(b)
    return rows(a)


def q_join(e, how="inner"):
    return e.scan_table("stacktraces").join(
        e.scan_table("dims"), on=["labels.node"], how=how
    )


def test_sum_right_by_key():
    store, db = build_db()
    out = run_both(
        db,
        lambda e: q_join(e)
        .filter(E.Col("timestamp").gt_eq(100))
        .aggregate([E.Sum(E.Col("weight"))], [E.Col("labels.node")]),
    )
    assert out  # non-empty result


def test_all_agg_funcs_both_sides():
    store, db = build_db()
    run_both(
        db,
        lambda e: q_join(e).aggregate(
            [
                E.Sum(E.Col("weight")),
                E.Count(E.Col("weight")),
                E.Min(E.Col("weight")),
                E.Max(E.Col("weight")),
                E.Sum(E.Col("value")),
                E.Min(E.Col("value")),
                E.Max(E.Col("value")),
                E.Count(E.Col("value")),
            ],
            [E.Col("labels.node")],
        ),
    )


def test_group_by_non_key_and_window():
    store, db = build_db()
    run_both(
        db,
        lambda e: q_join(e)
        .filter(E.Col("timestamp").lt(700))
        .aggregate(
            [E.Sum(E.Col("weight")), E.Count(E.Col("value"))],
            [E.Duration(250)],
        ),
    )
    run_both(
        db,
        lambda e: q_join(e).aggregate(
            [E.Sum(E.Col("weight"))],
            [E.Col("example_type"), E.Col("labels.node")],
        ),
        # example_type is absent from every part -> generic missing-column
        # semantics (part lacks example_type)
        expect_path="generic",
    )


def test_avg_rewrite():
    store, db = build_db()
    run_both(
        db,
        lambda e: q_join(e).aggregate(
            [E.Avg(E.Col("weight"))], [E.Col("labels.node")]
        ),
    )


def test_semi_anti():
    store, db = build_db()
    for how in ("semi", "anti"):
        run_both(
            db,
            lambda e: q_join(e, how).aggregate(
                [E.Sum(E.Col("value")), E.Count(E.Col("value"))],
                [E.Col("labels.node")],
            ),
        )


def test_or_in_filters_combined():
    store, db = build_db()
    run_both(
        db,
        lambda e: q_join(e)
        .filter(
            E.And(
                E.Or(
                    E.Col("timestamp").lt(300),
                    E.Col("timestamp").gt_eq(800),
                ),
                E.Col("labels.node").regex_match(r"^n[12]"),
            )
        )
        .aggregate([E.Sum(E.Col("weight"))], [E.Col("labels.node")]),
    )


def test_empty_right_and_no_matches():
    store, db = build_db()
    # dims filtered to nothing -> inner join empty, anti keeps all valid
    run_both(
        db,
        lambda e: e.scan_table("stacktraces")
        .join(
            e.scan_table("dims").filter(E.Col("weight").gt(10**9)),
            on=["labels.node"],
            how="inner",
        )
        .aggregate([E.Sum(E.Col("weight"))], [E.Col("labels.node")]),
    )
    run_both(
        db,
        lambda e: e.scan_table("stacktraces")
        .join(
            e.scan_table("dims").filter(E.Col("weight").gt(10**9)),
            on=["labels.node"],
            how="anti",
        )
        .aggregate([E.Count(E.Col("value"))], [E.Col("labels.node")]),
    )


def test_right_subquery_filter():
    store, db = build_db()
    run_both(
        db,
        lambda e: q_join(e).aggregate(
            [E.Sum(E.Col("weight"))], [E.Col("labels.node")]
        ),
    )
    run_both(
        db,
        lambda e: e.scan_table("stacktraces")
        .join(
            e.scan_table("dims").filter(E.Col("weight").gt(0)),
            on=["labels.node"],
            how="inner",
        )
        .aggregate(
            [E.Sum(E.Col("weight")), E.Sum(E.Col("value"))],
            [E.Col("labels.node")],
        ),
    )


def test_wide_values():
    # Build-side sums past int32 and probe values needing the two-plane
    # (wide) path; products bounded by the candidate-corner range.
    store, db = build_db(value_scale=3_000_000_000)
    run_both(
        db,
        lambda e: q_join(e).aggregate(
            [
                E.Sum(E.Col("value")),
                E.Min(E.Col("value")),
                E.Max(E.Col("value")),
                E.Count(E.Col("value")),
            ],
            [E.Col("labels.node")],
        ),
    )


def test_missing_right_column_is_all_null():
    store, db = build_db()
    run_both(
        db,
        lambda e: q_join(e).aggregate(
            [E.Sum(E.Col("nosuchcol"))], [E.Col("labels.node")]
        ),
    )


def test_renamed_right_column():
    # Build side carries a column name that collides with the probe side:
    # the joined batch renames it ``value_right`` and aggs may reference
    # either name (plain name = probe side, renamed = build side).
    store = ColumnStore()
    db = store.db("t")
    table = db.table("stacktraces", TableConfig(schema=sample_definition()))
    d_l = table.dictionary("labels")
    rng = np.random.default_rng(3)
    n = 2000
    node, nodev = d_l.encode([f"n{int(i)}" for i in rng.integers(0, 10, n)])
    table.insert_record(
        ColumnBatch(
            [
                Column("labels.node", KIND_DICT, node, nodev, d_l),
                Column(
                    "timestamp",
                    KIND_INT64,
                    rng.integers(0, 100, n).astype(np.int64),
                    np.ones(n, bool),
                ),
                Column(
                    "value",
                    KIND_INT64,
                    rng.integers(0, 50, n).astype(np.int64),
                    np.ones(n, bool),
                ),
            ],
            n,
        ),
        sort=True,
    )
    table.sync()
    dims = db.table("dims", TableConfig(schema=_dims_schema(("value",))))
    d_dim = dims.dictionary("labels")
    codes, _ = d_dim.encode([f"n{i}" for i in range(0, 10, 2)])
    m = len(codes)
    dims.insert_record(
        ColumnBatch(
            [
                Column(
                    "labels.node", KIND_DICT, codes, np.ones(m, bool), d_dim
                ),
                Column(
                    "value",
                    KIND_INT64,
                    np.arange(m, dtype=np.int64) * 7,
                    np.ones(m, bool),
                ),
            ],
            m,
        )
    )
    run_both(
        db,
        lambda e: q_join(e).aggregate(
            [E.Sum(E.Col("value")), E.Sum(E.Col("value_right"))],
            [E.Col("labels.node")],
        ),
    )


def test_left_outer_null_group_keys_fall_back():
    # left_outer keeps null-key rows, whose group key is null -> the
    # compiled tiers cannot emit the null-key group
    store, db = build_db(null_keys=True)
    run_both(
        db,
        lambda e: q_join(e, "left_outer").aggregate(
            [E.Sum(E.Col("weight"))], [E.Col("labels.node")]
        ),
        expect_path="generic",
    )


def test_left_outer_fused():
    # valid keys everywhere -> the left_outer decomposition serves:
    # unmatched rows emit one row with null build values (zero slots)
    store, db = build_db(null_keys=False, weight_lo=0)
    run_both(
        db,
        lambda e: q_join(e, "left_outer").aggregate(
            [
                E.Sum(E.Col("weight")),
                E.Count(E.Col("weight")),
                E.Min(E.Col("weight")),
                E.Max(E.Col("weight")),
                E.Sum(E.Col("value")),
                E.Count(E.Col("value")),
            ],
            [E.Col("labels.node")],
        ),
    )
    run_both(
        db,
        lambda e: q_join(e, "left_outer")
        .filter(E.Col("timestamp").lt(600))
        .aggregate(
            [E.Sum(E.Col("weight")), E.Count(E.Col("value"))],
            [E.Duration(250)],
        ),
    )


def test_left_outer_negative_partials_fall_back():
    # negative build-side sums break the bias-0 requirement of the
    # left_outer gathered planes -> generic (weights in build_db span
    # [-100, 100], so per-code sums go negative for some seeds)
    store, db = build_db(seed=9, null_keys=False)
    fe = LocalEngine(db.table_provider())
    out = []
    q_join(fe, "left_outer").aggregate(
        [E.Sum(E.Col("weight"))], [E.Col("labels.node")]
    ).execute(out.append)
    assert fe.last_serving_path == "generic"
    assert "non-negative" in fe.last_fallback_reasons.get(
        "compiled_join", ""
    )
    # and still byte-identical through the generic path
    rows_out = run_both(
        db,
        lambda e: q_join(e, "left_outer").aggregate(
            [E.Sum(E.Col("weight"))], [E.Col("labels.node")]
        ),
        expect_path="generic",
    )
    assert rows_out


def test_dict_growth_between_queries():
    store, db = build_db()
    table = db.get_table("stacktraces")
    d_l = table.dictionary("labels")

    def q(e):
        return q_join(e).aggregate(
            [E.Sum(E.Col("weight")), E.Count(E.Col("value"))],
            [E.Col("labels.node")],
        )

    run_both(db, q)
    # grow the dictionary + add a part, rerun
    rng = np.random.default_rng(11)
    n = 1000
    node, nodev = d_l.encode([f"m{int(i)}" for i in rng.integers(0, 30, n)])
    table.insert_record(
        ColumnBatch(
            [
                Column("labels.node", KIND_DICT, node, nodev, d_l),
                Column(
                    "timestamp",
                    KIND_INT64,
                    rng.integers(0, 1000, n).astype(np.int64),
                    np.ones(n, bool),
                ),
                Column(
                    "value",
                    KIND_INT64,
                    rng.integers(-10, 10, n).astype(np.int64),
                    np.ones(n, bool),
                ),
            ],
            n,
        ),
        sort=True,
    )
    table.sync()
    run_both(db, q)


def test_fuzz_parity():
    for seed in (1, 2, 3):
        store, db = build_db(
            seed=seed,
            n_parts=2 + seed % 3,
            n_per_part=1500,
            null_keys=bool(seed % 2),
            value_scale=10 ** (3 + seed),
        )
        rng = np.random.default_rng(seed * 101)
        for _q in range(4):
            lit = int(rng.integers(0, 1000))
            aggs = [E.Sum(E.Col("weight")), E.Count(E.Col("value"))]
            if rng.random() < 0.5:
                aggs.append(E.Min(E.Col("weight")))
                aggs.append(E.Max(E.Col("value")))
            if rng.random() < 0.5:
                aggs.append(E.Sum(E.Col("value")))
            groups = [E.Col("labels.node")]
            if rng.random() < 0.4:
                groups.append(E.Duration(200))
            run_both(
                db,
                lambda e: q_join(e)
                .filter(E.Col("timestamp").gt_eq(lit))
                .aggregate(aggs, groups),
            )


def _int_key_db(seed=0, id_lo=1000, id_hi=9000, dims_lo=500, dims_hi=8000):
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
            ColumnDef("id", StorageLayout(TYPE_INT64, nullable=True)),
            ColumnDef("v", StorageLayout(TYPE_INT64, nullable=True)),
        ),
        (SortingColumnDef("g", "asc", True),),
    )
    store = ColumnStore()
    db = store.db("ik")
    t = db.table("t", TableConfig(schema=schema))
    dg = t.dictionary("g")
    rng = np.random.default_rng(seed)
    for _ in range(2):
        n = 2500
        gc, gv = dg.encode([f"g{int(i)}" for i in rng.integers(0, 6, n)])
        ids = rng.integers(id_lo, id_hi, n).astype(np.int64)
        iv = rng.random(n) > 0.05
        t.insert_record(
            ColumnBatch(
                [
                    Column("g", KIND_DICT, gc, gv, dg),
                    Column("id", KIND_INT64, np.where(iv, ids, 0), iv),
                    Column(
                        "v",
                        KIND_INT64,
                        rng.integers(-50, 50, n).astype(np.int64),
                        np.ones(n, bool),
                    ),
                ],
                n,
            ),
            sort=True,
        )
    t.sync()
    dims = db.table(
        "dims",
        TableConfig(
            schema=SchemaDef(
                "dims",
                (
                    ColumnDef(
                        "id", StorageLayout(TYPE_INT64, nullable=True)
                    ),
                    ColumnDef(
                        "w", StorageLayout(TYPE_INT64, nullable=True)
                    ),
                ),
                (),
            )
        ),
    )
    m = 400
    did = rng.integers(dims_lo, dims_hi, m).astype(np.int64)
    dv = rng.random(m) > 0.1
    dims.insert_record(
        ColumnBatch(
            [
                Column("id", KIND_INT64, np.where(dv, did, 0), dv),
                Column(
                    "w",
                    KIND_INT64,
                    rng.integers(0, 100, m).astype(np.int64),
                    rng.random(m) > 0.15,
                ),
            ],
            m,
        )
    )
    return store, db


def _int_join(e, how="inner"):
    return e.scan_table("t").join(
        e.scan_table("dims"), on=["id"], how=how
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_int_key_join_fused(seed):
    # Range-dense int64 join keys (id joins): codes derive from the probe
    # parts' zone-map span; build rows outside the span match nothing.
    store, db = _int_key_db(seed=seed)
    run_both(
        db,
        lambda e: _int_join(e).aggregate(
            [
                E.Sum(E.Col("w")),
                E.Count(E.Col("v")),
                E.Min(E.Col("w")),
                E.Max(E.Col("w")),
                E.Sum(E.Col("v")),
            ],
            [E.Col("g")],
        ),
    )
    run_both(
        db,
        lambda e: _int_join(e)
        .filter(E.Col("id").lt(5000))
        .aggregate([E.Sum(E.Col("w"))], [E.Col("g")]),
    )
    for how in ("semi", "anti"):
        run_both(
            db,
            lambda e: _int_join(e, how).aggregate(
                [E.Sum(E.Col("v")), E.Count(E.Col("v"))], [E.Col("g")]
            ),
        )


def test_int_key_span_ceiling_falls_back():
    # key span past the LUT ceiling (2^21) -> generic
    store, db = _int_key_db(id_lo=0, id_hi=1 << 24, dims_hi=1 << 24)
    run_both(
        db,
        lambda e: _int_join(e).aggregate(
            [E.Sum(E.Col("w"))], [E.Col("g")]
        ),
        expect_path="generic",
    )


def test_int_key_left_outer_falls_back():
    store, db = _int_key_db()
    run_both(
        db,
        lambda e: _int_join(e, "left_outer").aggregate(
            [E.Sum(E.Col("w"))], [E.Col("g")]
        ),
        expect_path="generic",
    )
