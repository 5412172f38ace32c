"""Macro benchmarks: the reference's Parca-style production query harnesses
plus durability paths (reference: bench_test.go:229 BenchmarkQuery —
Types/Labels/Values/Merge/Range — :376 BenchmarkReplay, :402
BenchmarkSnapshot, :449 Benchmark_Serialize; all skipped upstream without a
private data directory, bench_test.go:28-35 — so these harnesses publish
numbers the reference never did).

Methodology:
- Query shapes run through the public engine (LocalEngine + compiled
  serving), i.e. end-to-end wall clock including planning, host epilogues,
  and the device round-trip. Under the axon tunnel each host<->device fetch
  costs ~25 ms RTT, which bounds per-query latency regardless of chip
  speed; per-query literals cycle so the terminal's (executable, inputs)
  memoization never short-circuits an iteration (see CLAUDE.md).
- Replay / Snapshot / Serialize are host-side paths and time honestly
  anywhere.

Prints one JSON line per metric (this is evidence tooling; the driver's
contract metric stays in bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import numpy as np


def build_db(storage_path: str, n_rows: int = 500_000, n_parts: int = 4):
    from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
    from frostdb_tpu.db import ColumnStore
    from frostdb_tpu.schema import sample_definition
    from frostdb_tpu.table import TableConfig

    store = ColumnStore(storage_path=storage_path, enable_wal=True)
    db = store.db("parca")
    table = db.table("stacktraces", TableConfig(schema=sample_definition()))
    d_et = table.dictionary("example_type")
    d_l = table.dictionary("labels")
    d_st = table.dictionary("stacktrace")
    rng = np.random.default_rng(42)
    per = n_rows // n_parts
    for _p in range(n_parts):
        n = per
        et, etv = d_et.encode(
            [("cpu", "alloc", "inuse")[i % 3] for i in rng.integers(0, 3, n)]
        )
        st, stv = d_st.encode([f"s{int(i)}" for i in rng.integers(0, 2000, n)])
        node, nodev = d_l.encode([f"n{int(i)}" for i in rng.integers(0, 40, n)])
        batch = ColumnBatch(
            [
                Column("example_type", KIND_DICT, et, etv, d_et),
                Column("labels.node", KIND_DICT, node, nodev, d_l),
                Column("stacktrace", KIND_DICT, st, stv, d_st),
                Column(
                    "timestamp",
                    KIND_INT64,
                    rng.integers(0, 100_000, n).astype(np.int64),
                    np.ones(n, dtype=bool),
                ),
                Column(
                    "value",
                    KIND_INT64,
                    rng.integers(0, 1_000_000, n).astype(np.int64),
                    np.ones(n, dtype=bool),
                ),
            ],
            n,
        )
        table.insert_record(batch, sort=True)
    return store, db, table


def emit(metric: str, value: float, unit: str) -> None:
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": unit,
                "vs_baseline": None,  # the reference publishes no numbers
            }
        )
    )


def time_query(name: str, run, iters: int = 5, engine=None) -> None:
    # two warmups (jit compile; a second pass catches shapes the first
    # didn't touch), then timed passes with distinct inputs
    run(0)
    run(iters + 1)
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        run(i)
    dt = (time.perf_counter() - t0) / iters
    path = getattr(engine, "last_serving_path", None)
    if path is not None:
        reasons = getattr(engine, "last_fallback_reasons", {})
        note = f" ({'; '.join(f'{k}: {v}' for k, v in reasons.items())})" if reasons else ""
        print(f"# query_{name} served by: {path}{note}")
    emit(f"query_{name}", dt * 1000.0, "ms/query")


def main() -> None:
    from frostdb_tpu.query import expr as E
    from frostdb_tpu.query.engine import LocalEngine

    tmp = tempfile.mkdtemp(prefix="frostdb_macro_")
    try:
        store, db, table = build_db(os.path.join(tmp, "db"))
        table.sync()  # settle background rotation/compaction: stable
        # part shapes mean the warmup pass covers every jit shape the
        # timed passes will hit
        engine = LocalEngine(db.table_provider())
        n_rows = 500_000

        def drain(q):
            out = []
            q.execute(out.append)
            return sum(b.num_rows for b in out)

        # Types (bench_test.go:107): distinct type columns + projected compare
        time_query(
            "types",
            lambda i: drain(
                engine.scan_table("stacktraces").distinct(
                    E.Col("example_type"), E.Col("value").gt(500_000 + i)
                )
            ),
            engine=engine,
        )
        # Labels (bench_test.go:117): schema scan + regex distinct
        time_query(
            "labels",
            lambda i: drain(
                engine.scan_schema("stacktraces")
                .distinct(E.Col("name"))
                .filter(E.Col("name").regex_match(r"^labels\..+$"))
            ),
            engine=engine,
        )
        # Values (bench_test.go:123): distinct label values
        time_query(
            "values",
            lambda i: drain(
                engine.scan_table("stacktraces").distinct(E.Col("labels.node"))
            ),
            engine=engine,
        )
        # Merge (bench_test.go:299): filtered sum by stacktrace
        time_query(
            "merge",
            lambda i: drain(
                engine.scan_table("stacktraces")
                .filter(E.Col("timestamp").lt(50_000 + i))
                .aggregate([E.Sum(E.Col("value"))], [E.Col("stacktrace")])
            ),
            engine=engine,
        )
        # Range (bench_test.go:322): filtered sum by (labels, timestamp)...
        # grouped here by the label column (timestamps are dense); the
        # compiled path serves it from device-cached parts.
        time_query(
            "range",
            lambda i: drain(
                engine.scan_table("stacktraces")
                .filter(E.Col("timestamp").gt_eq(25_000 + i))
                .aggregate(
                    [E.Sum(E.Col("value")), E.Count(E.Col("value"))],
                    [E.Col("labels.node")],
                )
            ),
            engine=engine,
        )

        # Merge with label matchers (the actual Parca merge shape,
        # bench_test.go:299's queries carry label equality + a timestamp
        # range): an AND conjunction with a dict-equality leaf — lowered
        # onto the fused kernels via the table-global dictionary LUT.
        time_query(
            "merge_labeled",
            lambda i: drain(
                engine.scan_table("stacktraces")
                .filter(
                    E.And(
                        E.Col("labels.node").eq(f"n{i % 40}"),
                        E.Col("timestamp").gt_eq(25_000 + i),
                        E.Col("timestamp").lt(75_000 + i),
                    )
                )
                .aggregate([E.Sum(E.Col("value"))], [E.Col("stacktrace")])
            ),
            engine=engine,
        )

        # Engine-level hash join (north-star component; VERDICT r3 weak #2:
        # no join benchmark existed): facts ⨝ dims on a dict key + group
        # aggregate. Key building is dictionary-code based (query/join.py
        # _dict_key_codes) — sublinear in row count.
        from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
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

        dims = db.table(
            "dims",
            TableConfig(
                schema=SchemaDef(
                    "dims",
                    (
                        ColumnDef(
                            "labels.node",
                            StorageLayout(
                                TYPE_STRING,
                                nullable=True,
                                encoding=ENCODING_RLE_DICTIONARY,
                            ),
                        ),
                        ColumnDef("weight", StorageLayout(TYPE_INT64)),
                    ),
                    (SortingColumnDef("labels.node", "asc", True),),
                )
            ),
        )
        d_dim = dims.dictionary("labels")
        dim_codes, _dv = d_dim.encode([f"n{i}" for i in range(0, 40, 2)])
        m = len(dim_codes)
        dims.insert_record(
            ColumnBatch(
                [
                    Column(
                        "labels.node", KIND_DICT, dim_codes,
                        np.ones(m, bool), d_dim,
                    ),
                    Column(
                        "weight", KIND_INT64,
                        np.arange(m, dtype=np.int64), np.ones(m, bool),
                    ),
                ],
                m,
            )
        )
        time_query(
            "join_agg",
            lambda i: drain(
                engine.scan_table("stacktraces")
                .filter(E.Col("timestamp").gt_eq(i))
                .join(
                    engine.scan_table("dims"), on=["labels.node"], how="inner"
                )
                .aggregate([E.Sum(E.Col("weight"))], [E.Col("labels.node")])
            ),
            engine=engine,
        )

        # Device-resident filter->project row retrieval (round-4 envelope,
        # reference filter.go:276-354 materialization): selection +
        # compaction on device, host materializes only selected rows.
        time_query(
            "filter_project",
            lambda i: drain(
                engine.scan_table("stacktraces")
                .filter(E.Col("value").gt(995_000 + i))  # ~0.5% selected
                .project(E.Col("example_type"), E.Col("value"))
            ),
            engine=engine,
        )

        # Serialize (bench_test.go:449): full sorted block serialization
        t0 = time.perf_counter()
        parts = table.active_block.index.rotate(
            lambda ps: [table.compact_parts(ps)]
        )
        dt = time.perf_counter() - t0
        emit("serialize_block", n_rows / dt / 1e6, "M rows/s")

        # Snapshot (bench_test.go:402)
        from frostdb_tpu.snapshot import write_snapshot

        t0 = time.perf_counter()
        write_snapshot(db, db.snapshot_dir)
        emit("snapshot_write", (time.perf_counter() - t0) * 1000.0, "ms")
        store.close()

        # Replay (bench_test.go:376): fresh open replays WAL + snapshot
        from frostdb_tpu.db import ColumnStore

        t0 = time.perf_counter()
        store2 = ColumnStore(storage_path=os.path.join(tmp, "db"), enable_wal=True)
        db2 = store2.db("parca")
        assert db2.get_table("stacktraces") is not None
        emit("replay_open", (time.perf_counter() - t0) * 1000.0, "ms")
        store2.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
