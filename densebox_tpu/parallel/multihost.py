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


def _backends_initialized() -> bool:
    """Whether any XLA backend has already been created in this process.
    jax.distributed.initialize() must run strictly before that point."""
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge.backends_are_initialized())
    except Exception:  # private API moved — be permissive, initialize() will
        return False   # raise its own (accurate) error if it's too late


def ensure_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto: Optional[bool] = None,
) -> None:
    """Initialize jax.distributed when running multi-process.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars > TPU-pod auto-detection
    (``auto=True`` or JAX_AUTO_DISTRIBUTED=1: all-None initialize() lets jax
    autodetect on Cloud TPU VMs) > single-process no-op.

    Must be called before any backend-touching jax API (jax.devices(),
    jax.process_count(), any computation): initialize() raises once a backend
    exists. That is also why this function cannot *query* jax to decide
    whether it is needed — the decision comes from args/env alone.
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env(
        "JAX_PROCESS_ID")
    if auto is None:
        auto = os.environ.get("JAX_AUTO_DISTRIBUTED") == "1"
    if coordinator_address is None and num_processes is None and not auto:
        return  # single process, nothing configured
    if _backends_initialized():
        raise RuntimeError(
            "ensure_distributed() was called after a JAX backend was already "
            "initialized; jax.distributed.initialize() must run first. Call "
            "ensure_distributed() at program start, before any jax API that "
            "touches devices.")
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
