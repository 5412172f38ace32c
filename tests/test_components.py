"""Unit tests for auxiliary components: typed records, ordered aggregation,
tracing, memory limiter, metrics, dbtool, sampler (reference test files:
internal/records/record_builder_test.go, ordered_aggregate_test.go,
query/memory.go, sampler_test.go)."""

from dataclasses import dataclass, field

import numpy as np
import pytest

from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.query.physical import ExecOptions
from frostdb_tpu.records import GenericTable, build_batch, schema_for
from frostdb_tpu.table import TableConfig


@dataclass
class Sample:
    example_type: str = field(
        default="", metadata={"rle_dict": True, "asc": 0}
    )
    labels: dict = field(
        default_factory=dict,
        metadata={"rle_dict": True, "asc": 1, "null_first": True},
    )
    timestamp: int = field(default=0, metadata={"asc": 2})
    value: int = 0


def test_schema_for_dataclass():
    sd = schema_for(Sample)
    names = [c.name for c in sd.columns]
    assert names == ["example_type", "labels", "timestamp", "value"]
    labels = sd.columns[1]
    assert labels.dynamic
    sorting = [s.name for s in sd.sorting_columns]
    assert sorting == ["example_type", "labels", "timestamp"]


def test_generic_table_write_and_query():
    store = ColumnStore()
    db = store.db("t")
    table = db.table("samples", TableConfig(schema=schema_for(Sample)))
    gt = GenericTable(table, Sample)
    gt.write(
        Sample("cpu", {"node": "n1"}, 1, 10),
        Sample("cpu", {"node": "n2"}, 2, 20),
        Sample("mem", {"node": "n1", "pod": "p"}, 3, 30),
    )
    engine = LocalEngine(db.table_provider())
    out = []
    engine.scan_table("samples").aggregate(
        [E.Sum(E.Col("value"))], [E.Col("example_type")]
    ).execute(out.append)
    res = {
        out[0].column("example_type").py_value(i): int(
            out[0].column("sum(value)").values[i]
        )
        for i in range(out[0].num_rows)
    }
    assert res == {"cpu": 30, "mem": 30}


def test_ordered_aggregation_via_builder():
    """Builder-direct aggregation with ordered aggregations enabled plans
    OrderedAggregate when groups prefix-match sorting columns (reference:
    shouldPlanOrderedAggregate physicalplan.go:518)."""
    from frostdb_tpu.query.optimize import optimize
    from frostdb_tpu.query.physical import OrderedAggregate, build_physical
    from frostdb_tpu.query.logical import Builder
    from frostdb_tpu.schema import sample_definition
    from tests.test_db import _make_batch

    store = ColumnStore()
    db = store.db("t")
    table = db.table("s", TableConfig(schema=sample_definition()))
    table.insert_record(_make_batch(table))

    plan = (
        Builder()
        .scan(db.table_provider(), "s")
        .aggregate([E.Sum(E.Col("value"))], [E.Col("example_type")])
        .build()
    )
    plan = optimize(plan)
    output = build_physical(plan, ExecOptions(ordered_aggregations=True))
    assert "OrderedAggregate" in output.draw_string()
    results = []
    output.execute(results.append)
    assert int(results[0].column("sum(value)").values[0]) == 6

    # and without the option, HashAggregate
    plan2 = (
        Builder()
        .scan(db.table_provider(), "s")
        .aggregate([E.Sum(E.Col("value"))], [E.Col("example_type")])
        .build()
    )
    plan2 = optimize(plan2)
    out2 = build_physical(plan2, ExecOptions())
    assert "HashAggregate" in out2.draw_string()
    r2 = []
    out2.execute(r2.append)
    assert int(r2[0].column("sum(value)").values[0]) == 6


def test_tracer_spans():
    from frostdb_tpu.tracing import Tracer

    t = Tracer()
    with t.span("query", table="t") as s:
        with t.span("scan"):
            pass
        with t.span("aggregate"):
            pass
    assert len(t.roots) == 1
    root = t.roots[0].to_dict()
    assert root["name"] == "query"
    assert [c["name"] for c in root["children"]] == ["scan", "aggregate"]


def test_memory_limiter():
    from frostdb_tpu.memorylimit import LimitAllocator, MemoryLimitExceeded

    a = LimitAllocator(1000)
    a.allocate(600)
    with pytest.raises(MemoryLimitExceeded):
        a.allocate(600)
    a.free(600)
    a.allocate(600)
    assert a.allocated() == 600


def test_metrics_registry():
    from frostdb_tpu.metrics import MetricsRegistry

    m = MetricsRegistry()
    tm = m.table_metrics("db", "t")
    tm.rows_inserted.inc(5)
    tm.active_block_size.set(123)
    text = m.expose()
    assert "rows_inserted" in text and "5.0" in text


def test_reservoir_sampler():
    from frostdb_tpu.query.physical import OutputPlan, ReservoirSampler
    from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_INT64

    s = ReservoirSampler(size=10, byte_limit=1 << 20, seed=42)
    sink = []

    class Sink:
        def callback(self, b):
            sink.append(b)

        def finish(self):
            pass

    s.set_next(Sink())
    n = 500
    batch = ColumnBatch(
        [
            Column(
                "x",
                KIND_INT64,
                np.arange(n, dtype=np.int64),
                np.ones(n, dtype=bool),
            )
        ],
        n,
    )
    s.callback(batch)
    s.finish()
    total = sum(b.num_rows for b in sink)
    assert total == 10
    vals = [int(v) for b in sink for v in b.column("x").values]
    assert len(set(vals)) == 10 and all(0 <= v < n for v in vals)


def test_dbtool_snapshot_and_wal(tmp_path, capsys):
    from frostdb_tpu.snapshot import write_snapshot
    from frostdb_tpu.tools.dbtool import main as dbtool_main
    from frostdb_tpu.schema import sample_definition
    from tests.test_db import _make_batch
    import os

    store = ColumnStore(storage_path=str(tmp_path), enable_wal=True)
    db = store.db("x")
    table = db.table("t", TableConfig(schema=sample_definition()))
    table.insert_record(_make_batch(table))
    tx = write_snapshot(db, db.snapshot_dir)
    store.close()

    snap = os.path.join(db.snapshot_dir, f"{tx:020d}.fdbt")
    dbtool_main(["snapshot", snap])
    out = capsys.readouterr().out
    assert f"snapshot tx: {tx}" in out

    wal_dir = os.path.join(str(tmp_path), "databases", "x", "wal")
    dbtool_main(["wal", wal_dir])
    out = capsys.readouterr().out
    assert "entries:" in out and "write" in out


def test_dbtool_reencode(tmp_path, capsys):
    """reference: cmd/parquet-reencode — rewrite a parquet file through a
    schema, re-sorting rows by its sorting columns."""
    import json
    import os

    import pyarrow.parquet as pq

    from frostdb_tpu.schema import sample_definition
    from frostdb_tpu.tools.dbtool import main as dbtool_main
    from tests.test_db import _make_batch

    store = ColumnStore(storage_path=str(tmp_path))
    db = store.db("x")
    table = db.table("t", TableConfig(schema=sample_definition()))
    b = _make_batch(table)
    # write an UNSORTED parquet file (reverse row order)
    rev = b.take(np.arange(b.num_rows)[::-1])
    import pyarrow as pa

    src = os.path.join(str(tmp_path), "in.parquet")
    pq.write_table(pa.Table.from_batches([rev.to_arrow()]), src)
    sfile = os.path.join(str(tmp_path), "schema.json")
    with open(sfile, "w") as f:
        json.dump(sample_definition().to_dict(), f)
    out_path = os.path.join(str(tmp_path), "out.parquet")
    dbtool_main(["reencode", src, sfile, out_path])
    out = capsys.readouterr().out
    assert "reencoded" in out
    t = pq.read_table(out_path)
    ts = t.column("timestamp").to_pylist()
    assert ts == sorted(ts)
    assert b"frostdb_tpu.schema" in t.schema.metadata
    store.close()


def test_query_memory_limit():
    """reference: Test_DB_Limiter db_test.go:1666 — a query exceeding the
    limit fails with 'memory limit exceeded', others succeed."""
    from frostdb_tpu.memorylimit import LimitAllocator, MemoryLimitExceeded
    from frostdb_tpu.schema import sample_definition
    from frostdb_tpu.table import TableConfig
    from tests.test_db import _make_batch

    store = ColumnStore()
    db = store.db("lim")
    table = db.table("t", TableConfig(schema=sample_definition()))
    table.insert_record(_make_batch(table, n=100))

    # Pin the generic path: its accounting accumulates input batch bytes
    # (the fast tiers account only their tiny per-query transients and can
    # legitimately serve this query under 64 bytes — see
    # tests/test_memlimit_fast_tiers.py for their raise/succeed contract).
    tiny = LocalEngine(db.table_provider(), allocator=LimitAllocator(64))
    tiny.exec_options.compiled_serving = False
    with pytest.raises(MemoryLimitExceeded):
        tiny.scan_table("t").aggregate(
            [E.Sum(E.Col("value"))], [E.Col("example_type")]
        ).execute(lambda b: None)

    roomy = LocalEngine(
        db.table_provider(), allocator=LimitAllocator(10 * 1024 * 1024)
    )
    out = []
    roomy.scan_table("t").aggregate(
        [E.Sum(E.Col("value"))], [E.Col("example_type")]
    ).execute(out.append)
    assert out


def test_unique_primary_index_compaction():
    """reference: UniquePrimaryIndex — compaction keeps only the newest row
    per sorting-key tuple (table.go:1465)."""
    from frostdb_tpu.schema import sample_definition
    from frostdb_tpu.table import TableConfig
    from tests.test_db import _make_batch, _query_sum

    store = ColumnStore()
    db = store.db("u")
    table = db.table(
        "t",
        TableConfig(schema=sample_definition(), unique_primary_index=True),
    )
    # identical sort keys (same types/labels/timestamps), different values
    b1 = _make_batch(table)  # values 1,2,3
    table.insert_record(b1)
    b2 = _make_batch(table)
    b2.column("value").values[:] = [10, 20, 30]
    table.insert_record(b2)

    assert _query_sum(db, "t") == 66  # before compaction both visible
    table.active_block.index.compact_level(0)
    assert _query_sum(db, "t") == 60  # newest rows (10+20+30) survive


def test_reservoir_sampler_byte_budget():
    """A tiny byte budget forces materialization: the reservoir must copy
    sampled rows instead of pinning every scanned batch (reference:
    sampler.go:18-289), while the sample itself is identical to the
    unbounded-budget run (same seed, same stream)."""
    from frostdb_tpu.query.physical import ReservoirSampler
    from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_INT64

    def run(byte_limit):
        s = ReservoirSampler(size=8, byte_limit=byte_limit, seed=7)
        sink = []

        class Sink:
            def callback(self, b):
                sink.append(b)

            def finish(self):
                pass

        s.set_next(Sink())
        for lo in range(0, 4000, 100):
            n = 100
            batch = ColumnBatch(
                [
                    Column(
                        "x",
                        KIND_INT64,
                        np.arange(lo, lo + n, dtype=np.int64),
                        np.ones(n, dtype=bool),
                    )
                ],
                n,
            )
            s.callback(batch)
        pinned = s._pinned_bytes()
        s.finish()
        vals = sorted(int(v) for b in sink for v in b.column("x").values)
        return s, pinned, vals

    s_small, pinned_small, vals_small = run(4096)
    s_big, pinned_big, vals_big = run(1 << 30)
    assert vals_small == vals_big  # storage policy must not change the sample
    assert s_small.materializations > 0
    assert s_big.materializations == 0
    assert pinned_small <= 4096
    assert pinned_big > 4096  # refs pin whole input batches without a budget


def test_filter_plan_validation():
    """VERDICT r3 item 10 (reference: validate.go:322-455): ill-typed
    filters raise PlanValidationError at plan time, with AND/OR
    recursion, instead of a runtime EvalError."""
    import pytest

    from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_INT64
    from frostdb_tpu.db import ColumnStore
    from frostdb_tpu.query import expr as E
    from frostdb_tpu.query.engine import LocalEngine
    from frostdb_tpu.query.validate import PlanValidationError
    from frostdb_tpu.schema import sample_definition
    from frostdb_tpu.table import TableConfig

    store = ColumnStore()
    db = store.db("v")
    table = db.table("t", TableConfig(schema=sample_definition()))
    import numpy as np

    n = 3
    d = table.dictionary("example_type")
    codes, _ = d.encode(["a"] * n)
    from frostdb_tpu.columnbatch import KIND_DICT

    table.insert_record(
        ColumnBatch(
            [
                Column("example_type", KIND_DICT, codes, np.ones(n, bool), d),
                Column(
                    "timestamp",
                    KIND_INT64,
                    np.arange(n, dtype=np.int64),
                    np.ones(n, bool),
                ),
                Column(
                    "value",
                    KIND_INT64,
                    np.arange(n, dtype=np.int64),
                    np.ones(n, bool),
                ),
            ],
            n,
        )
    )
    engine = LocalEngine(db.table_provider())

    def run(filt):
        out = []
        engine.scan_table("t").filter(filt).aggregate(
            [E.Sum(E.Col("value"))], [E.Col("example_type")]
        ).execute(out.append)
        return out

    # numeric column vs string literal
    with pytest.raises(PlanValidationError):
        run(E.Col("timestamp").gt_eq("abc"))
    # string column vs numeric literal
    with pytest.raises(PlanValidationError):
        run(E.Col("example_type").eq(42))
    # the same inside an AND subtree (recursion, validate.go:424)
    with pytest.raises(PlanValidationError) as ei:
        run(
            E.And(
                E.Col("timestamp").gt_eq(1),
                E.Col("example_type").eq(3.5),
            )
        )
    assert "right" in str(ei.value)
    # and inside OR
    with pytest.raises(PlanValidationError):
        run(
            E.Or(
                E.Col("example_type").eq("a"),
                E.Col("timestamp").lt("zzz"),
            )
        )
    # well-typed filters (incl. null literal and dynamic columns) pass
    assert run(E.Col("timestamp").gt_eq(1))
    assert run(E.Col("labels.anything").eq("x")) is not None
    assert run(E.Col("example_type").not_eq(None))


def test_dbtool_row_and_find(tmp_path, capsys):
    """reference: cmd/parquet-tool/cmd/{row,find}.go — row-group-resolving
    row dumps and stat-pruned value search."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from frostdb_tpu.schema import sample_definition
    from frostdb_tpu.tools.dbtool import main as dbtool_main
    from tests.test_db import _make_batch

    store = ColumnStore()
    db = store.db("x")
    table = db.table("t", TableConfig(schema=sample_definition()))
    b = _make_batch(table)
    src = os.path.join(str(tmp_path), "f.parquet")
    pq.write_table(
        pa.Table.from_batches([b.to_arrow()]), src, row_group_size=2
    )

    dbtool_main(["parquet-row", "1", "2", src])
    out = capsys.readouterr().out
    assert out.startswith("row 1:") and "row 2:" in out

    ts = int(b.column("timestamp").values[0])
    dbtool_main(["parquet-find", f"timestamp={ts}", src])
    out = capsys.readouterr().out
    assert "matched" in out and "row 0:" in out

    # directory walk + no-match path
    dbtool_main(["parquet-find", "timestamp=999999999", str(tmp_path)])
    out = capsys.readouterr().out
    assert "matched 0 rows" in out
