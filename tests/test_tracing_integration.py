"""Tracing + metrics are wired through the engine (VERDICT r1 item 9):
a traced query produces a span tree with the plan diagram attached, inner
scan spans nest under the query root, and durability metrics are nonzero
after real work (reference: spans threaded through Iterator/Build/Execute,
table.go:752, physicalplan.go:296,505; metrics.go:34-365)."""

import numpy as np

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.query.physical import ExecOptions
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.store import FileSystemBucket
from frostdb_tpu.table import TableConfig
from frostdb_tpu.tracing import Tracer


def _mk(tmp_path=None):
    kwargs = {}
    if tmp_path is not None:
        bucket = FileSystemBucket(str(tmp_path / "bucket"))
        kwargs = dict(
            storage_path=str(tmp_path / "db"),
            enable_wal=True,
            sources=[bucket],
            sinks=[bucket],
        )
    store = ColumnStore(**kwargs)
    db = store.db("tr")
    table = db.table("t", TableConfig(schema=sample_definition()))
    n = 50
    d_et = table.dictionary("example_type")
    d_l = table.dictionary("labels")
    d_st = table.dictionary("stacktrace")
    et, etv = d_et.encode(["cpu"] * n)
    lv, lvv = d_l.encode([f"l{i % 3}" for i in range(n)])
    st, stv = d_st.encode(["s"] * n)
    table.insert_record(
        ColumnBatch(
            [
                Column("example_type", KIND_DICT, et, etv, d_et),
                Column("labels.label1", KIND_DICT, lv, lvv, d_l),
                Column("stacktrace", KIND_DICT, st, stv, d_st),
                Column(
                    "timestamp",
                    KIND_INT64,
                    np.arange(n, dtype=np.int64),
                    np.ones(n, dtype=bool),
                ),
                Column(
                    "value",
                    KIND_INT64,
                    np.ones(n, dtype=np.int64),
                    np.ones(n, dtype=bool),
                ),
            ],
            n,
        ),
        sort=True,
    )
    return store, db, table


def _span_names(span):
    out = [span.name]
    for c in span.children:
        out.extend(_span_names(c))
    return out


def test_query_span_tree_generic_path():
    _s, db, _t = _mk()
    tracer = Tracer()
    engine = LocalEngine(
        db.table_provider(),
        ExecOptions(compiled_serving=False, tracer=tracer),
    )
    out = []
    engine.scan_table("t").filter(E.Col("timestamp").gt_eq(10)).aggregate(
        [E.Sum(E.Col("value"))], [E.Col("labels.label1")]
    ).execute(out.append)
    assert out
    assert len(tracer.roots) == 1
    root = tracer.roots[0]
    names = _span_names(root)
    assert root.name == "query/execute"
    assert "plan/optimize" in names
    assert "physical/build" in names
    assert "physical/execute" in names
    assert "table/iterator" in names
    assert "TableScan" in root.attributes["plan"]
    assert root.attributes["path"] == "generic"
    scan = [
        c
        for c in root.children
        for c in _flatten(c)
        if c.name == "table/iterator"
    ][0]
    assert scan.attributes["parts_scanned"] >= 1
    assert root.duration > 0
    d = root.to_dict()
    assert d["children"]


def _flatten(span):
    yield span
    for c in span.children:
        yield from _flatten(c)


def test_query_span_tree_compiled_path():
    _s, db, _t = _mk()
    tracer = Tracer()
    engine = LocalEngine(
        db.table_provider(), ExecOptions(tracer=tracer)
    )
    out = []
    engine.scan_table("t").aggregate(
        [E.Sum(E.Col("value"))], [E.Col("example_type")]
    ).execute(out.append)
    assert out
    root = tracer.roots[0]
    assert root.attributes["path"] == "compiled"
    assert "compiled/execute" in _span_names(root)


def test_untraced_query_has_no_overhead_path():
    _s, db, _t = _mk()
    engine = LocalEngine(db.table_provider())
    out = []
    engine.scan_table("t").aggregate(
        [E.Sum(E.Col("value"))], [E.Col("example_type")]
    ).execute(out.append)
    assert out  # no tracer: nothing recorded anywhere, query still works


def test_durability_metrics_nonzero(tmp_path):
    store, db, table = _mk(tmp_path)
    from frostdb_tpu.snapshot import write_snapshot

    # force L0 compaction + snapshot + rotation
    table.active_block.index.compact_level(0)
    write_snapshot(db, db.snapshot_dir)
    table.rotate_block()
    m = store.metrics
    assert m.wal_records_logged.value() >= 1
    assert m.snapshots_total.value() >= 1
    assert m.snapshot_bytes.value() > 0
    assert m.wal_truncations.value() >= 1
    assert m.lsm_compactions(0).value() >= 1
    assert table.metrics.rotations.value() == 1
    text = m.expose()
    assert "frostdb_tpu_snapshots_total" in text
    store.close()


def test_fallback_reasons_surfaced():
    """VERDICT r3 weak #7: a query degrading from compiled->generic records
    WHY on the span, the engine, and the per-path metrics counter."""
    from frostdb_tpu.metrics import MetricsRegistry

    _s, db, _t = _mk()
    tracer = Tracer()
    registry = MetricsRegistry()
    engine = LocalEngine(
        db.table_provider(), ExecOptions(tracer=tracer, metrics=registry)
    )
    out = []
    # an unfiltered projection + sort has no fast tier -> every tier must
    # decline with a recorded reason (unique()/and(), limit-over-agg
    # peeling etc. compile since r5).
    engine.scan_table("t").project(E.Col("value")).order_by(
        "value"
    ).execute(out.append)
    assert out
    root = tracer.roots[0]
    assert root.attributes["path"] == "generic"
    reasons = root.attributes["fallback_reasons"]
    assert "compiled" in reasons and reasons["compiled"]
    assert engine.last_serving_path == "generic"
    assert engine.last_fallback_reasons == reasons
    assert registry.counter("queries_served_generic").value() == 1

    # A compiled-served query leaves no fallback attribute.
    out2 = []
    engine.scan_table("t").aggregate(
        [E.Sum(E.Col("value"))], [E.Col("example_type")]
    ).execute(out2.append)
    assert engine.last_serving_path == "compiled"
    assert registry.counter("queries_served_compiled").value() == 1
