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

    print(
        json.dumps(
            {
                "metric": "filter_hashagg_input_rows_per_sec_per_chip",
                "value": rows_per_sec,
                "unit": "rows/s",
                "vs_baseline": rows_per_sec / 1e9,
            }
        )
    )


if __name__ == "__main__":
    main()
