"""Deterministic simulation test (reference: dst/dst_test.go — 512 random
commands {insert .75, compact .25, snapshot .1, rotate .05, restart .01}
against a real DB, verifying a checksum of timestamps written vs read after
a final restart; dst_test.go:42-85).

The reference gets determinism from a WASM build with a patched runtime;
here the command stream is an explicitly seeded RNG and the engine is
single-process deterministic. Restarts exercise WAL replay + snapshot load +
persisted-block reads on every interleaving the seed produces.
"""

import os

import numpy as np
import pytest

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.snapshot import write_snapshot
from frostdb_tpu.store import FileSystemBucket
from frostdb_tpu.table import TableConfig

N_COMMANDS = 400
WEIGHTS = {
    "insert": 0.75,
    "compact": 0.25,
    "compact_l1": 0.10,  # spills into the disk-backed final level
    "snapshot": 0.10,
    "rotate": 0.05,
    "restart": 0.01,
}


def _open(path, bucket):
    store = ColumnStore(
        storage_path=path,
        enable_wal=True,
        sources=[bucket],
        sinks=[bucket],
        # Small segments so live WAL maintenance (segment-granular
        # truncation) is actually exercised within the run.
        wal_segment_size=32 * 1024,
    )
    db = store.db("dst")
    table = db.table("t", TableConfig(schema=sample_definition()))
    return store, db, table


def _wal_bytes(path):
    wal_dir = os.path.join(path, "databases", "dst", "wal")
    if not os.path.isdir(wal_dir):
        return 0
    return sum(
        os.path.getsize(os.path.join(wal_dir, f)) for f in os.listdir(wal_dir)
    )


def _insert(table, rng, next_ts):
    n = int(rng.integers(1, 20))
    d_et = table.dictionary("example_type")
    d_l = table.dictionary("labels")
    d_st = table.dictionary("stacktrace")
    et, etv = d_et.encode(["cpu"] * n)
    lv, lvv = d_l.encode([f"l{int(rng.integers(0, 5))}" for _ in range(n)])
    st, stv = d_st.encode(["s"] * n)
    ts = np.arange(next_ts, next_ts + n, dtype=np.int64)
    batch = ColumnBatch(
        [
            Column("example_type", KIND_DICT, et, etv, d_et),
            Column("labels.label1", KIND_DICT, lv, lvv, d_l),
            Column("stacktrace", KIND_DICT, st, stv, d_st),
            Column("timestamp", KIND_INT64, ts, np.ones(n, dtype=bool)),
            Column(
                "value",
                KIND_INT64,
                rng.integers(0, 100, n).astype(np.int64),
                np.ones(n, dtype=bool),
            ),
        ],
        n,
    )
    table.insert_record(batch, sort=True)
    return n


def _read_timestamps(db):
    engine = LocalEngine(db.table_provider())
    out = []
    engine.scan_table("t").project(E.Col("timestamp")).execute(out.append)
    ts = []
    for b in out:
        c = b.column("timestamp")
        if c is not None:
            ts.extend(int(v) for v in c.values[c.validity])
    return sorted(ts)


@pytest.mark.parametrize("seed", [0, 7, 21, 99])
def test_dst(tmp_path, seed):
    rng = np.random.default_rng(seed)
    path = str(tmp_path / "db")
    bucket = FileSystemBucket(str(tmp_path / "bucket"))
    store, db, table = _open(path, bucket)

    cmds = list(WEIGHTS)
    probs = np.array([WEIGHTS[c] for c in cmds])
    probs = probs / probs.sum()

    next_ts = 0
    written = 0
    max_wal = 0
    truncs = 0.0
    for _i in range(N_COMMANDS):
        cmd = rng.choice(cmds, p=probs)
        max_wal = max(max_wal, _wal_bytes(path))
        if cmd == "insert":
            n = _insert(table, rng, next_ts)
            next_ts += n
            written += n
        elif cmd == "compact":
            table.active_block.index.compact_level(0)
        elif cmd == "compact_l1":
            table.active_block.index.compact_level(1)
        elif cmd == "snapshot":
            write_snapshot(db, db.snapshot_dir)
        elif cmd == "rotate":
            table.rotate_block()
        elif cmd == "restart":
            truncs += store.metrics.wal_truncations.value()
            store.close()
            store, db, table = _open(path, bucket)

    # Live WAL maintenance (db.maintain_wal on snapshot/rotation) must keep
    # the WAL bounded: without truncation this run accumulates well over
    # 1 MiB of IPC-framed writes; the bound is a few segments of tail plus
    # the largest burst between durable points.
    truncs += db.store.metrics.wal_truncations.value()
    assert truncs > 0
    assert max_wal < 512 * 1024, f"WAL grew unbounded: peak {max_wal} bytes"
    write_snapshot(db, db.snapshot_dir)
    assert _wal_bytes(path) <= 3 * 32 * 1024, (
        f"post-snapshot WAL not reclaimed: {_wal_bytes(path)} bytes"
    )

    # final restart then verify every timestamp survived exactly once
    store.close()
    store, db, table = _open(path, bucket)
    got = _read_timestamps(db)
    assert got == list(range(next_ts)), (
        f"lost/duplicated rows: wrote {next_ts}, read {len(got)}; "
        f"first diffs: {[x for x in range(next_ts) if x not in set(got)][:5]}"
    )
    store.close()
