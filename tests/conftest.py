"""Test configuration: run everything on a virtual multi-device CPU mesh.

The TPU (axon) backend has high per-call latency in this environment, and
tests need float64 for tight physics tolerances, so the suite runs on CPU
with 8 virtual devices (for sharding tests). Benchmarks (bench.py) run on
the real TPU instead.
"""

import os

os.environ.setdefault("MPLBACKEND", "Agg")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import matplotlib  # noqa: E402

matplotlib.use("Agg")
