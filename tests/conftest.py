"""Test env: force CPU with 8 virtual devices (SURVEY.md §5.4).

Gotcha (this machine): a sitecustomize hook imports jax at interpreter
startup to register the 'axon' TPU plugin, so setting JAX_PLATFORMS in the
environment here is too late — jax has already snapshotted it. XLA_FLAGS is
still read lazily at first CPU-backend init, so the fake-device count works
from here, but platform selection must go through jax.config.

Real-TPU perf runs happen through bench.py, not the test suite.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
