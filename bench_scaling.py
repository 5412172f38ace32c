"""Scaling-efficiency harness: the SAME engine query on a 1-device vs an
N-device mesh (VERDICT item 1 'Done' criterion; BASELINE.json north star:
>=80% rows/s scaling efficiency 1 -> N).

Multi-chip TPU hardware isn't reachable from this environment, so this
harness runs on an N-virtual-device CPU mesh — it measures that the mesh
lowering *scales* (no serial bottleneck in the SPMD program), not absolute
TPU throughput (bench.py owns that). Run:

    python bench_scaling.py [n_devices] [rows]

Prints one JSON line: {"metric": "mesh_scaling_efficiency", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    n_devices = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
    from frostdb_tpu.db import ColumnStore
    from frostdb_tpu.parallel.mesh import make_mesh
    from frostdb_tpu.query import expr as E
    from frostdb_tpu.query.engine import LocalEngine
    from frostdb_tpu.query.physical import ExecOptions
    from frostdb_tpu.schema import sample_definition
    from frostdb_tpu.table import TableConfig

    store = ColumnStore()
    db = store.db("bench")
    table = db.table("t", TableConfig(schema=sample_definition()))
    rng = np.random.default_rng(0)
    num_codes = 64
    n = rows
    d_et = table.dictionary("example_type")
    d_l = table.dictionary("labels")
    d_st = table.dictionary("stacktrace")
    et, etv = d_et.encode(["cpu"])
    lc = rng.integers(0, num_codes, n).astype(np.int32)
    for i in range(num_codes):
        d_l.code(f"g{i}")
    st, stv = d_st.encode(["stack"])
    ones = np.ones(n, dtype=bool)
    table.insert_record(
        ColumnBatch(
            [
                Column("example_type", KIND_DICT, np.zeros(n, np.int32), ones, d_et),
                Column("labels.label1", KIND_DICT, lc, ones, d_l),
                Column("stacktrace", KIND_DICT, np.zeros(n, np.int32), ones, d_st),
                Column("timestamp", KIND_INT64, rng.integers(0, 1000, n).astype(np.int64), ones),
                Column("value", KIND_INT64, rng.integers(-500, 500, n).astype(np.int64), ones),
            ],
            n,
        )
    )

    def bench(mesh) -> float:
        opts = ExecOptions(mesh=mesh)
        engine = LocalEngine(db.table_provider(), opts)

        def q():
            out = []
            engine.scan_table("t").filter(
                E.Col("timestamp").gt_eq(100)
            ).aggregate(
                [E.Sum(E.Col("value")), E.Count(E.Col("value"))],
                [E.Col("labels.label1")],
            ).execute(out.append)
            return out[0]

        q()  # warm: partition upload + jit
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            q()
        dt = (time.perf_counter() - t0) / iters
        return n / dt

    r1 = bench(make_mesh(1))
    rN = bench(make_mesh(n_devices))
    # Virtual CPU devices share the host's physical cores, so the ceiling
    # on speedup is min(n_devices, cores) — efficiency is measured against
    # that achievable parallelism (on real multi-chip TPU hardware the
    # ceiling is n_devices).
    cores = len(os.sched_getaffinity(0))
    ceiling = min(n_devices, cores)
    eff = rN / (r1 * ceiling)
    print(
        json.dumps(
            {
                "metric": "mesh_scaling_efficiency",
                "value": round(eff, 4),
                "unit": f"fraction of {ceiling}x ceiling "
                f"(1->{n_devices} virtual devices, {cores} cores)",
                "rows_per_s_1dev": round(r1),
                "rows_per_s_ndev": round(rN),
                "speedup": round(rN / r1, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
