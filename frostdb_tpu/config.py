"""Global JAX configuration for frostdb_tpu.

The engine operates on int64/float64 columns (the reference's parquet
physical types, dynparquet/schema.go storage layouts), so 64-bit mode must be
enabled before any tracing happens. TPU emulates 64-bit integer arithmetic
with 32-bit lanes; the hot bench kernels are written against 32-bit lanes
explicitly where it matters (see ops/pallas_agg.py).
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: query-shape executables survive process
# restarts (test runs, CLI invocations) — the analogue of the reference's
# schema/writer pools (dynparquet/schema.go:1173), but for compiled kernels.
_cache_dir = os.environ.get(
    "FROSTDB_TPU_JIT_CACHE", os.path.expanduser("~/.cache/frostdb_tpu_jit")
)
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
except Exception:  # pragma: no cover - cache is best-effort
    pass

# Row-count padding: device batches are padded up to a multiple of LANE_TILE
# rows so XLA always sees aligned static shapes (8 sublanes x 128 lanes for
# f32; we use 1024 = 8*128 as the universal row tile).
ROW_TILE = 1024

# Minimum padded batch size. Tiny logictest batches all compile to the same
# executable at this size.
MIN_PAD_ROWS = 1024


def pad_length(n: int) -> int:
    """Static padded length for a batch of n rows: next power of two of the
    row tile, so the jit cache has O(log n) entries per column-set signature.
    """
    if n <= MIN_PAD_ROWS:
        return MIN_PAD_ROWS
    p = MIN_PAD_ROWS
    while p < n:
        p *= 2
    return p


# Scan fan-out: minimum total surviving rows before a query's part stream is
# split across lane threads (below this, thread spawn overhead exceeds the
# numpy/pyarrow GIL-released overlap win; results are byte-identical either
# way — see Table._iterate).
PARALLEL_SCAN_MIN_ROWS = 32768
