"""Device-resident filter->project serving (VERDICT r3 item 4): the
selection runs on device over cached parts, the host materializes only
selected rows, and output is byte-identical to the generic engine —
rows, row order, per-part batch boundaries, missing-dynamic-column
semantics. Reference: query/physicalplan/filter.go:276-354 (bitmap ->
IndexRanges materialization)."""

import numpy as np
import pytest

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.query.physical import ExecOptions
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.table import TableConfig


def _mk(n_parts=3, rows=500, seed=0):
    store = ColumnStore()
    db = store.db("s")
    table = db.table("t", TableConfig(schema=sample_definition()))
    rng = np.random.default_rng(seed)
    d_et = table.dictionary("example_type")
    d_l = table.dictionary("labels")
    d_st = table.dictionary("stacktrace")
    for p in range(n_parts):
        n = rows + 17 * p
        et, etv = d_et.encode(rng.choice(["cpu", "mem", "io"], n).tolist())
        st, stv = d_st.encode(["s"] * n)
        cols = [
            Column("example_type", KIND_DICT, et, etv, d_et),
            Column("stacktrace", KIND_DICT, st, stv, d_st),
            Column(
                "timestamp",
                KIND_INT64,
                rng.integers(0, 1000, n).astype(np.int64),
                np.ones(n, bool),
            ),
            Column(
                "value",
                KIND_INT64,
                rng.integers(-100, 100, n).astype(np.int64),
                np.ones(n, bool),
            ),
        ]
        if p != 1:  # one part lacks the dynamic column
            jobs = rng.choice(["api", "web", ""], n).tolist()
            jc, jv = d_l.encode(jobs)
            cols.insert(2, Column("labels.job", KIND_DICT, jc, jv, d_l))
        table.insert_record(ColumnBatch(cols, n))
    return store, db, table


def _run(db, compiled, q_fn):
    engine = LocalEngine(
        db.table_provider(), ExecOptions(compiled_serving=compiled)
    )
    out = []
    q_fn(engine.scan_table("t")).execute(out.append)
    return out, engine


def _batches_rows(batches):
    # (batch boundary, row tuples) — boundaries must match generic exactly
    return [
        [
            tuple((c.name, c.py_value(i)) for c in b.columns)
            for i in range(b.num_rows)
        ]
        for b in batches
    ]


QUERIES = {
    "filter-only": lambda q: q.filter(E.Col("timestamp").gt_eq(800)),
    "filter-project": lambda q: q.filter(E.Col("timestamp").lt(50)).project(
        E.Col("example_type"), E.Col("value")
    ),
    "dict-filter": lambda q: q.filter(E.Col("labels.job").eq("api")).project(
        E.Col("timestamp"), E.Col("labels.job")
    ),
    "or-filter": lambda q: q.filter(
        E.Or(E.Col("labels.job").eq("web"), E.Col("timestamp").gt(950))
    ).project(E.Col("value")),
    "and-filter": lambda q: q.filter(
        E.And(E.Col("example_type").eq("cpu"), E.Col("timestamp").lt(100))
    ),
    "dyncol-project": lambda q: q.filter(E.Col("timestamp").lt(40)).project(
        E.DynCol("labels"), E.Col("value")
    ),
    "computed-project": lambda q: q.filter(E.Col("timestamp").lt(60)).project(
        E.Col("example_type"),
        E.BinaryExpr(E.Col("value"), E.OP_MUL, E.Literal(2)),
    ),
    "nulllit": lambda q: q.filter(E.Col("labels.job").eq(None)).project(
        E.Col("timestamp")
    ),
}


@pytest.mark.parametrize("qname", sorted(QUERIES))
def test_scan_parity(qname):
    _s, db, _t = _mk()
    slow, _e = _run(db, False, QUERIES[qname])
    fast, engine = _run(db, True, QUERIES[qname])
    assert engine.last_serving_path == "compiled_scan", (
        engine.last_serving_path,
        engine.last_fallback_reasons,
    )
    assert _batches_rows(fast) == _batches_rows(slow)


def test_no_host_filter_evaluation(monkeypatch):
    """The device path must not evaluate the filter host-side over full
    columns (the whole point of VERDICT item 4)."""
    import frostdb_tpu.query.physeval as pe

    _s, db, _t = _mk()

    def boom(*a, **k):
        raise AssertionError("host filter_mask called on the device path")

    # warm first (device upload)
    _run(db, True, QUERIES["filter-project"])
    monkeypatch.setattr(pe, "filter_mask", boom)
    fast, engine = _run(db, True, QUERIES["filter-project"])
    assert engine.last_serving_path == "compiled_scan"
    assert sum(b.num_rows for b in fast) > 0


def test_capacity_escalation(monkeypatch):
    """Oversized partial blocks escalate the per-block capacity (and past
    _CAPB_MAX fall to bounded host re-filtering); every selected row comes
    back exactly once in order."""
    import frostdb_tpu.compiled_scan as cs

    monkeypatch.setattr(cs, "_CAPB0", 2)
    cs._SCAN_CACHE.clear()
    _s, db, _t = _mk()
    # ~half selected: far beyond capb=2 per block, below full blocks
    q_fn = lambda q: q.filter(E.Col("timestamp").gt_eq(500))
    slow, _ = _run(db, False, q_fn)
    fast, engine = _run(db, True, q_fn)
    assert engine.last_serving_path == "compiled_scan"
    assert _batches_rows(fast) == _batches_rows(slow)
    assert sum(b.num_rows for b in fast) > 500
    cs._SCAN_CACHE.clear()


def test_host_refilter_overflow_blocks(monkeypatch):
    """Blocks past _CAPB_MAX re-filter host-side with identical results."""
    import frostdb_tpu.compiled_scan as cs

    monkeypatch.setattr(cs, "_CAPB0", 2)
    monkeypatch.setattr(cs, "_CAPB_MAX", 2)
    cs._SCAN_CACHE.clear()
    _s, db, _t = _mk()
    q_fn = lambda q: q.filter(E.Col("timestamp").gt_eq(500)).project(
        E.Col("value"), E.Col("example_type")
    )
    slow, _ = _run(db, False, q_fn)
    fast, engine = _run(db, True, q_fn)
    assert engine.last_serving_path == "compiled_scan"
    assert _batches_rows(fast) == _batches_rows(slow)
    cs._SCAN_CACHE.clear()


def test_full_block_shortcut():
    """A filter selecting every row of whole blocks uses the arange path
    (bc == block size) byte-identically."""
    _s, db, _t = _mk(rows=9000)  # > one 8192-row block per part
    q_fn = lambda q: q.filter(E.Col("timestamp").gt_eq(-1))
    slow, _ = _run(db, False, q_fn)
    fast, engine = _run(db, True, q_fn)
    assert engine.last_serving_path == "compiled_scan"
    assert _batches_rows(fast) == _batches_rows(slow)


def test_unfiltered_scan_stays_generic():
    _s, db, _t = _mk()
    fast, engine = _run(db, True, lambda q: q.project(E.Col("value")))
    assert engine.last_serving_path == "generic"
    assert "compiled_scan" in engine.last_fallback_reasons


def test_empty_result():
    _s, db, _t = _mk()
    fast, engine = _run(
        db, True, lambda q: q.filter(E.Col("timestamp").gt_eq(10**9))
    )
    assert engine.last_serving_path == "compiled_scan"
    assert fast == []


@pytest.mark.parametrize("n", [0, 1, 7, 100, 10**6])
def test_limit_parity(n):
    # filter().project().limit(n): the bread-and-butter "show me n matching
    # rows" serving shape (VERDICT r4 weak #4; limit.go:17). Byte-identical
    # batch boundaries incl. the mid-batch slice.
    _s, db, _t = _mk()
    q = lambda qb: qb.filter(E.Col("timestamp").lt(500)).project(
        E.Col("example_type"), E.Col("value")
    ).limit(E.Literal(n))
    slow, _e = _run(db, False, q)
    fast, engine = _run(db, True, q)
    if n > 0:
        assert engine.last_serving_path == "compiled_scan", (
            engine.last_serving_path,
            engine.last_fallback_reasons,
        )
    assert _batches_rows(fast) == _batches_rows(slow)


def test_limit_without_projection():
    _s, db, _t = _mk()
    q = lambda qb: qb.filter(E.Col("timestamp").gt_eq(900)).limit(
        E.Literal(13)
    )
    slow, _e = _run(db, False, q)
    fast, engine = _run(db, True, q)
    assert engine.last_serving_path == "compiled_scan"
    assert _batches_rows(fast) == _batches_rows(slow)
