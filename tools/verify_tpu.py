#!/usr/bin/env python
"""On-TPU compiled-vs-generic parity check (VERDICT r1 item 6).

Runs on whatever backend JAX defaults to (the real TPU under axon; CPU in
CI) and asserts the compiled serving path emits byte-identical results to
the generic operator DAG over randomized parts, covering:

- sum/count/min/max, bias-shifted negative and nanosecond-magnitude values
- wide (two-plane) value spans past 32 bits
- multiple value columns per query
- integral float64 columns on the integer kernel path
- first-occurrence emission-order ties inside one superblock
- ordered (key-order) emission
- filtered and unfiltered scans, multi-part streams

Exits nonzero on the first mismatch. Usage:

    python tools/verify_tpu.py [--seeds N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _batch_tuples(batches):
    rows = []
    for b in batches:
        for i in range(b.num_rows):
            rows.append(tuple((c.name, c.py_value(i)) for c in b.columns))
    return rows


def _mk_table(rng, n_parts, rows, value_maker, k_types=7):
    from frostdb_tpu.columnbatch import (
        Column,
        ColumnBatch,
        KIND_DICT,
        KIND_INT64,
    )
    from frostdb_tpu.db import ColumnStore
    from frostdb_tpu.schema import sample_definition_with_float
    from frostdb_tpu.table import TableConfig

    store = ColumnStore()
    db = store.db("vtpu")
    table = db.table("t", TableConfig(schema=sample_definition_with_float()))
    d_et = table.dictionary("example_type")
    for _ in range(n_parts):
        n = int(rng.integers(max(1, rows // 2), rows + 1))
        et, etv = d_et.encode(
            [f"type{int(x)}" for x in rng.integers(0, k_types, n)]
        )
        vals = value_maker(rng, n)
        cols = [
            Column("example_type", KIND_DICT, et, etv, d_et),
            Column(
                "timestamp",
                KIND_INT64,
                rng.integers(0, 100, n).astype(np.int64),
                np.ones(n, dtype=bool),
            ),
        ]
        for name, kind, v in vals:
            cols.append(Column(name, kind, v, np.ones(n, dtype=bool)))
        table.insert_record(ColumnBatch(cols, n))
    return db, table


def _run(db, compiled, aggs, filt, ordered):
    from frostdb_tpu.query import expr as E
    from frostdb_tpu.query.engine import LocalEngine
    from frostdb_tpu.query.physical import ExecOptions

    engine = LocalEngine(
        db.table_provider(),
        ExecOptions(compiled_serving=compiled, ordered_aggregations=ordered),
    )
    q = engine.scan_table("t")
    if filt is not None:
        q = q.filter(filt)
    out = []
    q.aggregate(aggs, [E.Col("example_type")]).execute(out.append)
    return out


CASES = []


def case(name):
    def deco(fn):
        CASES.append((name, fn))
        return fn

    return deco


def _int_col(lo, hi):
    def maker(rng, n):
        return [("value", "int64", rng.integers(lo, hi, n).astype(np.int64))]

    return maker


@case("small-ints sum/count/min/max, filtered")
def _c1(rng):
    from frostdb_tpu.query import expr as E

    db, _ = _mk_table(rng, 3, 3000, _int_col(0, 100000))
    aggs = [
        E.Sum(E.Col("value")),
        E.Count(E.Col("value")),
        E.Min(E.Col("value")),
        E.Max(E.Col("value")),
    ]
    return db, aggs, E.Col("timestamp").gt_eq(50), False


@case("bias-shifted negatives")
def _c2(rng):
    from frostdb_tpu.query import expr as E

    db, _ = _mk_table(rng, 2, 2000, _int_col(-50_000, 50_000))
    aggs = [E.Sum(E.Col("value")), E.Min(E.Col("value")), E.Max(E.Col("value"))]
    return db, aggs, None, False


@case("nanosecond-timestamp magnitude (31-bit span, huge bias)")
def _c3(rng):
    base = 1_755_000_000_000_000_000

    def maker(rng, n):
        return [
            (
                "value",
                "int64",
                base + rng.integers(0, 2**31 - 1, n).astype(np.int64),
            )
        ]

    from frostdb_tpu.query import expr as E

    db, _ = _mk_table(rng, 2, 2000, maker)
    return db, [E.Sum(E.Col("value")), E.Count(E.Col("value"))], None, False


@case("wide 53-bit span (two-plane sums)")
def _c4(rng):
    from frostdb_tpu.query import expr as E

    db, _ = _mk_table(rng, 2, 2000, _int_col(-(2**52), 2**52))
    return db, [E.Sum(E.Col("value")), E.Count(E.Col("value"))], None, False


@case("wide-span min/max (two-plane lexicographic, ns timestamps)")
def _c4b(rng):
    base = 1_755_000_000_000_000_000

    def maker(rng, n):
        return [
            (
                "value",
                "int64",
                base + rng.integers(0, 2**40, n).astype(np.int64),
            )
        ]

    from frostdb_tpu.query import expr as E

    db, _ = _mk_table(rng, 3, 2000, maker)
    aggs = [
        E.Min(E.Col("value")),
        E.Max(E.Col("value")),
        E.Sum(E.Col("value")),
    ]
    return db, aggs, E.Col("timestamp").gt_eq(20), False


@case("wide-span min/max hi-plane ties across parts")
def _c4c(rng):
    def maker(rng, n):
        hi = rng.integers(0, 4, n).astype(np.int64)
        lo = rng.integers(0, 2**28, n).astype(np.int64)
        return [("value", "int64", (hi << 33) + lo)]

    from frostdb_tpu.query import expr as E

    db, _ = _mk_table(rng, 4, 1500, maker)
    aggs = [E.Min(E.Col("value")), E.Max(E.Col("value"))]
    return db, aggs, None, False


@case("multiple value columns")
def _c5(rng):
    def maker(rng, n):
        return [
            ("value", "int64", rng.integers(0, 1000, n).astype(np.int64)),
            ("value2", "int64", rng.integers(-900, 900, n).astype(np.int64)),
        ]

    from frostdb_tpu.query import expr as E

    db, _ = _mk_table(rng, 3, 1500, maker)
    aggs = [
        E.Sum(E.Col("value")),
        E.Sum(E.Col("value2")),
        E.Min(E.Col("value2")),
        E.Count(E.Col("value")),
    ]
    return db, aggs, E.Col("timestamp").lt(80), False


@case("integral float64 on the integer path")
def _c6(rng):
    def maker(rng, n):
        return [
            (
                "floatvalue",
                "float64",
                rng.integers(-1000, 1000, n).astype(np.float64),
            )
        ]

    from frostdb_tpu.query import expr as E

    db, _ = _mk_table(rng, 2, 2000, maker)
    aggs = [
        E.Sum(E.Col("floatvalue")),
        E.Min(E.Col("floatvalue")),
        E.Max(E.Col("floatvalue")),
    ]
    return db, aggs, None, False


@case("emission-order ties inside one superblock")
def _c7(rng):
    # Many codes first occurring in the same superblock: the TPU path must
    # refine ties host-side to exact first-row order.
    def maker(rng, n):
        return [("value", "int64", np.arange(n, dtype=np.int64))]

    from frostdb_tpu.query import expr as E

    db, _ = _mk_table(rng, 1, 2000, maker, k_types=64)
    return db, [E.Sum(E.Col("value"))], E.Col("timestamp").gt_eq(30), False


@case("ordered (key-order) emission")
def _c8(rng):
    from frostdb_tpu.query import expr as E

    db, _ = _mk_table(rng, 2, 1500, _int_col(0, 1000), k_types=20)
    return db, [E.Sum(E.Col("value")), E.Count(E.Col("value"))], None, True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=2)
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}", flush=True)

    failures = 0
    for seed in range(args.seeds):
        for name, fn in CASES:
            rng = np.random.default_rng(1000 + seed)
            db, aggs, filt, ordered = fn(rng)
            fast = _run(db, True, aggs, filt, ordered)
            slow = _run(db, False, aggs, filt, ordered)
            ft, st = _batch_tuples(fast), _batch_tuples(slow)
            status = "ok" if ft == st else "MISMATCH"
            if ft != st:
                failures += 1
                print(f"[seed {seed}] {name}: {status}")
                for i, (a, b) in enumerate(zip(ft, st)):
                    if a != b:
                        print(f"  row {i}: compiled={a}")
                        print(f"  row {i}:  generic={b}")
                        break
                if len(ft) != len(st):
                    print(f"  rows: compiled={len(ft)} generic={len(st)}")
            else:
                print(f"[seed {seed}] {name}: ok ({len(ft)} groups)")
    if failures:
        print(f"FAIL: {failures} case(s) mismatched")
        return 1
    print("PASS: compiled path byte-identical to generic engine")
    return 0


if __name__ == "__main__":
    sys.exit(main())
