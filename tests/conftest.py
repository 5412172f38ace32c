"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the driver separately dry-runs the
mesh path; real-TPU benchmarking happens via bench.py).

jax is already imported by the time conftest runs (pytest plugins pull it
in), so the platform override must go through jax.config, not the
environment; XLA_FLAGS is still honored because no backend has initialized
yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
