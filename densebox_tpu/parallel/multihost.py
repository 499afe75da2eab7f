"""Multi-host bootstrap (SURVEY.md §3.3 "communication backend" row).

On a multi-host TPU slice every host runs the same program;
``jax.distributed.initialize`` wires the hosts together, after which
``jax.devices()`` spans the full slice and the mesh/pjit layer in
parallel/mesh.py works unchanged — DP gradient psums ride ICI within the
slice and DCN across slices, emitted by XLA (there is no hand-written
transport in this framework, by design).

Single-host (and this machine's single-chip tunnel) is a no-op, so callers
can invoke unconditionally. Untestable here (one chip, SURVEY.md Appendix
A); kept minimal and standard for that reason.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def ensure_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed when running multi-process.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars > TPU-pod auto-detection
    (args all None on Cloud TPU VMs lets jax autodetect) > single-process
    no-op.
    """
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env(
        "JAX_PROCESS_ID")
    if coordinator_address is None and num_processes is None:
        return  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
