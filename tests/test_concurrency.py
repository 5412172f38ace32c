"""Concurrent-writer stress + read isolation (reference: table_test.go:77
concurrent inserts, table_test.go:272 read isolation; the Go suite runs
under -race — here the mutex-guarded runtime is stressed from real threads
and snapshot isolation is asserted at every observed watermark)."""

import threading

import numpy as np

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.table import TableConfig

N_WRITERS = 8
INSERTS_PER_WRITER = 40
ROWS_PER_INSERT = 10


def _batch(table, lo):
    n = ROWS_PER_INSERT
    d_et = table.dictionary("example_type")
    d_st = table.dictionary("stacktrace")
    et, etv = d_et.encode(["cpu"] * n)
    st, stv = d_st.encode(["s"] * n)
    return ColumnBatch(
        [
            Column("example_type", KIND_DICT, et, etv, d_et),
            Column("stacktrace", KIND_DICT, st, stv, d_st),
            Column(
                "timestamp",
                KIND_INT64,
                np.arange(lo, lo + n, dtype=np.int64),
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
    )


def test_concurrent_writers_and_isolated_readers():
    store = ColumnStore()
    db = store.db("cc")
    table = db.table("t", TableConfig(schema=sample_definition()))
    create_tx = db.high_watermark()  # table creation consumed txns

    errors: list[str] = []
    stop = threading.Event()

    def writer(wid: int):
        try:
            for i in range(INSERTS_PER_WRITER):
                lo = (wid * INSERTS_PER_WRITER + i) * ROWS_PER_INSERT
                table.insert_record(_batch(table, lo))
        except Exception as e:  # pragma: no cover
            errors.append(f"writer {wid}: {e!r}")

    def compactor():
        while not stop.is_set():
            try:
                table.active_block.index.compact_level(0)
            except Exception as e:  # pragma: no cover
                errors.append(f"compactor: {e!r}")

    def reader():
        # Snapshot isolation: a view at watermark W must see exactly the
        # rows of every insert txn <= W — never a torn prefix of a batch,
        # never rows from uncommitted txns.
        while not stop.is_set():
            try:

                def check(tx):
                    parts = table.collect_parts(tx)
                    n = sum(p.num_rows() for p in parts)
                    expect = (tx - create_tx) * ROWS_PER_INSERT
                    if n != expect:
                        errors.append(
                            f"isolation: watermark {tx} saw {n} rows, "
                            f"expected {expect}"
                        )

                table.view(check)
            except Exception as e:  # pragma: no cover
                errors.append(f"reader: {e!r}")

    writers = [
        threading.Thread(target=writer, args=(w,)) for w in range(N_WRITERS)
    ]
    aux = [threading.Thread(target=compactor), threading.Thread(target=reader),
           threading.Thread(target=reader)]
    for t in aux:
        t.start()
    for t in writers:
        t.start()
    for t in writers:
        t.join()
    stop.set()
    for t in aux:
        t.join()

    assert not errors, errors[:5]
    total = N_WRITERS * INSERTS_PER_WRITER * ROWS_PER_INSERT
    final = table.collect_parts(db.high_watermark())
    assert sum(p.num_rows() for p in final) == total
    # every timestamp exactly once (no lost/duplicated inserts under races)
    ts = np.sort(
        np.concatenate(
            [p.batch.column("timestamp").values for p in final]
        )
    )
    assert np.array_equal(ts, np.arange(total, dtype=np.int64))
    assert db.high_watermark() == create_tx + N_WRITERS * INSERTS_PER_WRITER
