"""Test env: force CPU with 8 virtual devices (SURVEY.md §5.4) BEFORE jax import.

Real-TPU perf runs happen through bench.py, not the test suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
