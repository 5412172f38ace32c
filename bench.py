"""Headline benchmark: input rows/s/chip on a filter + hash-aggregate query.

Query shape (BASELINE.json configs / examples-aggregations):
    select sum(value), count(value) group by labels.g where timestamp >= T

Data: dictionary-coded group column (64 groups), int32 values, int32
timestamps — the reference's Parca-style schema after table-global
dictionary encoding (columnbatch.py). The hot kernel is the Pallas fused
one-hot MXU aggregation (ops/pallas_agg.py); results are verified exactly
against numpy before timing.

Methodology notes:
- Data is generated on device once into HBM (the chip is reached through a
  network tunnel; host->device copies would time the tunnel, not the chip)
  as multiple distinct datasets, all resident in HBM.
- Iterations are dependency-chained (iteration i+1's filter literal depends
  on iteration i's output) and only the final result is fetched, so the
  device executes every query serially over real HBM reads while the
  tunnel round-trip (~25 ms) is paid once.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 1e9 (the north-star 1B rows/s/chip target,
BASELINE.md — the reference publishes no numbers of its own).
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from frostdb_tpu.ops.pallas_agg import (
        pallas_filter_group_sum_count,
        to_row_major,
    )

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"

    num_codes = 64
    log_n = 25 if on_tpu else 20
    n = 1 << log_n

    def gen(seed, n_rows):
        i = jnp.arange(n_rows, dtype=jnp.uint32) + seed * jnp.uint32(0x9E3779B9)
        h = (i * jnp.uint32(2654435761)) ^ (i >> 16)
        return (
            (h % jnp.uint32(num_codes)).astype(jnp.int32),
            ((h >> 8) % jnp.uint32(1000)).astype(jnp.int32),
            ((h >> 4) % jnp.uint32(100)).astype(jnp.int32),
        )

    @functools.partial(jax.jit, static_argnames=("n_rows",))
    def make(seed, n_rows):
        c, v, t = gen(seed, n_rows)
        return to_row_major(c), to_row_major(v), to_row_major(t)

    @jax.jit
    def step(cols, carry, lit_base):
        c, v, t = cols
        # carry is >= 0 but the compiler cannot prove it: minimum() forces a
        # true data dependency between iterations. lit_base varies per
        # iteration so every (dataset, literal) pair is unique — the axon
        # terminal memoizes identical (executable, inputs) calls, which would
        # otherwise turn repeat passes into cache hits.
        lit = jnp.minimum(carry, jnp.int64(0)).astype(jnp.int32) + lit_base
        sums, counts = pallas_filter_group_sum_count(c, v, t, lit, num_codes)
        return sums, counts

    # exact correctness check on one dataset
    d0 = make(jnp.uint32(7), n)
    sums, counts = step(d0, jnp.int64(0), jnp.int32(50))
    sums_np = np.asarray(sums)
    counts_np = np.asarray(counts)
    i = np.arange(n, dtype=np.uint64).astype(np.uint32) + np.uint32(
        (7 * 0x9E3779B9) & 0xFFFFFFFF
    )
    h = (i * np.uint32(2654435761)) ^ (i >> 16)
    cc = (h % np.uint32(num_codes)).astype(np.int32)
    vv = ((h >> 8) % np.uint32(1000)).astype(np.int64)
    tt = (h >> 4) % np.uint32(100)
    m = tt >= 50
    es = np.zeros(num_codes, np.int64)
    ec = np.zeros(num_codes, np.int64)
    np.add.at(es, cc[m], vv[m])
    np.add.at(ec, cc[m], 1)
    assert np.array_equal(sums_np, es), "sum mismatch"
    assert np.array_equal(counts_np, ec), "count mismatch"

    # timing: chained iterations over distinct HBM-resident datasets
    n_datasets = 8 if on_tpu else 2
    datasets = [make(jnp.uint32(s), n) for s in range(n_datasets)]
    for d in datasets:
        jax.block_until_ready(d)

    def run_chain(passes, lit0):
        carry = jnp.int64(0)
        it = 0
        t0 = time.perf_counter()
        for _p in range(passes):
            for d in datasets:
                sums, _counts = step(d, carry, jnp.int32(lit0 + it))
                carry = sums[0]
                it += 1
        _ = np.asarray(carry)  # single fetch forces the whole chain
        return time.perf_counter() - t0, passes * len(datasets)

    run_chain(1, 10)  # warm
    dt, iters = run_chain(8 if on_tpu else 1, 40)
    rows_per_sec = n * iters / dt

    result = {
        "metric": "filter_hashagg_input_rows_per_sec_per_chip",
        "value": rows_per_sec,
        "unit": "rows/s",
        "vs_baseline": rows_per_sec / 1e9,
    }
    try:
        result.update(engine_bench(on_tpu))
    except Exception as e:  # the contract metric must survive
        result["engine_bench_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(result))


def engine_bench(on_tpu: bool) -> dict:
    """Engine-path serving throughput (VERDICT r2 item 6): the SAME query
    shape executed through ``LocalEngine`` over a multi-part device-cached
    Table on the compiled serving path — per-part kernel dispatch, compact
    code remap, emission epilogue and the single blob fetch all included.

    Each query pays one device->host fetch; through the axon tunnel that is
    a ~25 ms network RTT a local host would not pay, so the RTT (measured
    on a tiny fetch) is reported separately and subtracted for the
    compute-side number. Unique literals per query defeat the terminal's
    (executable, inputs) memoization."""
    import time

    import jax.numpy as jnp

    from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
    from frostdb_tpu.db import ColumnStore
    from frostdb_tpu.query import expr as E
    from frostdb_tpu.query.engine import LocalEngine
    from frostdb_tpu.schema import sample_definition
    from frostdb_tpu.table import TableConfig

    num_codes = 64
    n_parts = 8 if on_tpu else 2
    rows_per_part = (1 << 21) if on_tpu else (1 << 15)
    store = ColumnStore()
    db = store.db("bench")
    table = db.table("t", TableConfig(schema=sample_definition()))
    rng = np.random.default_rng(0)
    for _p in range(n_parts):
        n_rows = rows_per_part
        d_et = table.dictionary("example_type")
        d_l = table.dictionary("labels")
        d_st = table.dictionary("stacktrace")
        et, etv = d_et.encode(["cpu"])
        lc_codes = rng.integers(0, num_codes, n_rows).astype(np.int32)
        # register all label values once, then use raw codes
        d_l.encode([f"g{i}" for i in range(num_codes)])
        st, stv = d_st.encode(["stack"])
        table.insert_record(
            ColumnBatch(
                [
                    Column(
                        "example_type", KIND_DICT,
                        np.zeros(n_rows, np.int32), np.ones(n_rows, bool), d_et,
                    ),
                    Column(
                        "labels.label1", KIND_DICT,
                        lc_codes, np.ones(n_rows, bool), d_l,
                    ),
                    Column(
                        "stacktrace", KIND_DICT,
                        np.zeros(n_rows, np.int32), np.ones(n_rows, bool), d_st,
                    ),
                    Column(
                        "timestamp", KIND_INT64,
                        rng.integers(0, 1000, n_rows).astype(np.int64),
                        np.ones(n_rows, bool),
                    ),
                    Column(
                        "value", KIND_INT64,
                        rng.integers(0, 1000, n_rows).astype(np.int64),
                        np.ones(n_rows, bool),
                    ),
                ],
                n_rows,
            )
        )
    total_rows = n_parts * rows_per_part
    engine = LocalEngine(db.table_provider())

    def run_query(lit: int):
        out = []
        engine.scan_table("t").filter(
            E.Col("timestamp").gt_eq(int(lit))
        ).aggregate(
            [E.Sum(E.Col("value")), E.Count(E.Col("value"))],
            [E.Col("labels.label1")],
        ).execute(out.append)
        return out[0]

    table.sync()  # settle background compactions: a stable part set
    for w in range(4):  # warm: device upload + jit for every part shape
        run_query(50 + w)

    # tunnel RTT baseline: tiny fetch, unique inputs each time
    rtts = []
    for i in range(6):
        a = jnp.full((8,), jnp.int64(i))
        t0 = time.perf_counter()
        _ = np.asarray(a + jnp.int64(i))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    q = 12 if on_tpu else 3
    t0 = time.perf_counter()
    for i in range(q):
        b = run_query(40 + i)  # unique literal: no memoized replay
        assert b.num_rows == num_codes
    dt = time.perf_counter() - t0
    per_query = dt / q
    raw = total_rows / per_query
    adj = total_rows / max(per_query - rtt, 1e-9)
    return {
        "engine_rows_per_sec": adj,
        "engine_rows_per_sec_with_rtt": raw,
        "engine_query_latency_ms": per_query * 1e3,
        "tunnel_rtt_ms": rtt * 1e3,
        "engine_rows_per_query": total_rows,
    }


if __name__ == "__main__":
    main()
