"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the driver separately dry-runs the
mesh path; real-TPU benchmarking happens via bench.py)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
