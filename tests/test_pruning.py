"""Scan pruning on dict/string columns (reference: the parquet bloom-filter
+ dictionary pruning path, query/expr/binaryscalarexpr.go:104-110): a
label-equality or regex query must touch only the parts whose code-presence
sets can match, with results identical to an unpruned scan."""

import numpy as np
import pytest

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.lsm import prune_part
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.table import TableConfig


def _mk_table():
    store = ColumnStore()
    db = store.db("p")
    table = db.table("t", TableConfig(schema=sample_definition()))
    return store, db, table


def _insert_label_part(table, label: str, values, ts0=0):
    n = len(values)
    d_et = table.dictionary("example_type")
    d_l = table.dictionary("labels")
    d_st = table.dictionary("stacktrace")
    et, etv = d_et.encode(["cpu"] * n)
    lv, lvv = d_l.encode([label] * n)
    st, stv = d_st.encode(["s"] * n)
    batch = ColumnBatch(
        [
            Column("example_type", KIND_DICT, et, etv, d_et),
            Column("labels.label1", KIND_DICT, lv, lvv, d_l),
            Column("stacktrace", KIND_DICT, st, stv, d_st),
            Column(
                "timestamp",
                KIND_INT64,
                np.arange(ts0, ts0 + n, dtype=np.int64),
                np.ones(n, dtype=bool),
            ),
            Column(
                "value",
                KIND_INT64,
                np.asarray(values, dtype=np.int64),
                np.ones(n, dtype=bool),
            ),
        ],
        n,
    )
    table.insert_record(batch, sort=True)


def _sum_where(db, flt):
    out = []
    (
        LocalEngine(db.table_provider())
        .scan_table("t")
        .filter(flt)
        .aggregate([E.Sum(E.Col("value"))], [])
        .execute(out.append)
    )
    total = 0
    for b in out:
        c = b.column("sum(value)")
        total += int(c.values[:b.num_rows].sum())
    return total


def test_label_equality_prunes_parts():
    store, db, table = _mk_table()
    for i in range(8):
        _insert_label_part(table, f"l{i}", [i + 1] * 10, ts0=i * 10)

    got = _sum_where(db, E.Col("labels.label1").eq("l3"))
    assert got == 4 * 10
    assert table.metrics.parts_pruned.value() == 7
    assert table.metrics.parts_scanned.value() == 1

    # A value no part contains prunes everything.
    got = _sum_where(db, E.Col("labels.label1").eq("nope"))
    assert got == 0
    assert table.metrics.parts_scanned.value() == 1  # unchanged


def test_regex_prunes_parts():
    store, db, table = _mk_table()
    for i in range(6):
        _insert_label_part(table, f"env{i}", [1] * 5, ts0=i * 5)
    got = _sum_where(db, E.Col("labels.label1").regex_match("env[01]$"))
    assert got == 10
    assert table.metrics.parts_scanned.value() == 2
    assert table.metrics.parts_pruned.value() == 4


def test_missing_dyncol_semantics_preserved():
    """Parts lacking the filtered dynamic column: equality with a non-empty
    string prunes; regex matching the empty string must NOT prune (missing
    column = null = empty match, regexpfilter.go:23-33)."""
    store, db, table = _mk_table()
    _insert_label_part(table, "x", [5] * 4)
    # Insert a part without labels.label1.
    n = 3
    d_et = table.dictionary("example_type")
    d_st = table.dictionary("stacktrace")
    et, etv = d_et.encode(["cpu"] * n)
    st, stv = d_st.encode(["s"] * n)
    batch = ColumnBatch(
        [
            Column("example_type", KIND_DICT, et, etv, d_et),
            Column("stacktrace", KIND_DICT, st, stv, d_st),
            Column(
                "timestamp",
                KIND_INT64,
                np.arange(100, 100 + n, dtype=np.int64),
                np.ones(n, dtype=bool),
            ),
            Column(
                "value",
                KIND_INT64,
                np.asarray([7] * n, dtype=np.int64),
                np.ones(n, dtype=bool),
            ),
        ],
        n,
    )
    table.insert_record(batch, sort=True)

    assert _sum_where(db, E.Col("labels.label1").eq("x")) == 20
    assert table.metrics.parts_pruned.value() == 1  # the label-less part
    # ".*" matches the empty string -> missing-column rows match.
    assert _sum_where(db, E.Col("labels.label1").regex_match(".*")) == 20 + 21
    # "x" does not match empty -> label-less part pruned again.
    assert _sum_where(db, E.Col("labels.label1").regex_match("^x$")) == 20


def test_prune_part_parity_fuzz():
    """prune_part must never prune a part the evaluator would match rows in
    (no false negatives), across random parts and predicates."""
    from frostdb_tpu.query.physeval import filter_mask

    rng = np.random.default_rng(5)
    store, db, table = _mk_table()
    d_l = table.dictionary("labels")
    labels = [f"v{i}" for i in range(12)]
    parts = []
    for _ in range(20):
        n = int(rng.integers(1, 30))
        chosen = [labels[int(rng.integers(0, 12))] for _ in range(n)]
        lv, lvv = d_l.encode(chosen)
        lvv = lvv & (rng.random(n) > 0.2)
        batch = ColumnBatch(
            [
                Column("labels.label1", KIND_DICT, lv, lvv, d_l),
                Column(
                    "value",
                    KIND_INT64,
                    rng.integers(-50, 50, n).astype(np.int64),
                    np.ones(n, dtype=bool),
                ),
            ],
            n,
        )
        tx = table.insert_record(batch)
        parts.append(table.active_block.index.scan(tx)[0])

    predicates = [
        E.Col("labels.label1").eq("v3"),
        E.Col("labels.label1").eq("absent"),
        E.Col("labels.label1").regex_match("v[0-2]"),
        E.Col("labels.label1").regex_not_match("v.*"),
        E.And(E.Col("labels.label1").eq("v1"), E.Col("value").gt(0)),
        E.Or(E.Col("labels.label1").eq("v1"), E.Col("value").gt(1000)),
        E.Col("labels.label1").gt("v8"),
        E.Col("value").lt_eq(-51),
    ]
    memo: dict = {}
    for pred in predicates:
        for part in parts:
            if prune_part(part, pred, memo):
                mask = filter_mask(part.batch, pred)
                assert not mask.any(), f"false negative: {pred}"


def test_agg_pushdown_minmax_skips_parts():
    """AggFuncPushDown effect in the scan (optimize.go:160-175): a global
    max(col)/min(col) query skips parts whose raw-value range cannot beat
    the running best, with results identical to a full scan."""
    store, db, table = _mk_table()
    # 6 parts; newest part (scanned first) holds the global max.
    for i in range(6):
        _insert_label_part(table, "x", list(range(i * 100, i * 100 + 10)), ts0=i * 10)

    def run(agg):
        out = []
        (
            LocalEngine(db.table_provider())
            .scan_table("t")
            .aggregate([agg], [])
            .execute(out.append)
        )
        (b,) = out
        return int(b.columns[-1].values[0])

    base_pruned = table.metrics.parts_pruned.value()
    assert run(E.Max(E.Col("value"))) == 509
    # newest-first scan: the newest part sets best=509; all 5 older pruned
    assert table.metrics.parts_pruned.value() - base_pruned == 5

    base_pruned = table.metrics.parts_pruned.value()
    assert run(E.Min(E.Col("value"))) == 0
    # min: best improves part by part until the oldest (which holds 0);
    # newest-first means no part can be skipped here
    assert table.metrics.parts_pruned.value() - base_pruned == 0

    # sum/count hints must not skip anything
    assert run(E.Sum(E.Col("value"))) == sum(
        v for i in range(6) for v in range(i * 100, i * 100 + 10)
    )
    assert run(E.Count(E.Col("value"))) == 60
