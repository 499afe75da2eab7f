"""StableHLO export — the ahead-of-time deployment artifact surface.

The reference deploys by shipping Python + a torch checkpoint (its test.py
re-builds the model every run; SURVEY.md §2 CLI row). The TPU-native
deployment story is stronger: ``jax.export`` serializes the ENTIRE jitted
detect pipeline (model forward + decode + NMS, params baked in as
constants) to portable StableHLO. The artifact is self-contained — loading
it needs jax but NOT densebox_tpu, the model code, or the checkpoint — and
version-stable across jax releases (StableHLO forward compatibility).

Format: ``MAGIC`` + one JSON metadata line (input contract + provenance)
+ the raw ``jax.export`` payload. ``load_exported`` returns a callable
with the same signature/outputs as ``make_detect_fn``'s inner call.

Multi-platform: pass ``platforms=('tpu', 'cpu')`` to lower for both at
export time (XLA keeps one module with platform dispatch). TPU exports of
landmark-enabled configs carry Mosaic (Pallas) custom calls; those are
behind ``DisabledSafetyCheck.custom_call`` — stable within a TPU
generation, re-export when retargeting (the jax.export compatibility
story for custom kernels).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional, Sequence, Tuple

MAGIC = b"DENSEBOX_STABLEHLO_V1\n"


def export_detect_program(model, params, infer_cfg, label_cfg,
                          batch: int, canvas_hw: Tuple[int, int],
                          platforms: Optional[Sequence[str]] = None):
    """Trace + lower the full detect pipeline for a fixed input contract
    ``(batch, H, W, 3) float32 RGB in [0, 1]`` and return the jax.export
    Exported object (params closed over — baked into the artifact)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from densebox_tpu.infer import detect_batch

    h, w = canvas_hw

    def fn(images):
        return detect_batch(model, params, images, infer_cfg, label_cfg)

    kwargs: Dict[str, Any] = {}
    if platforms:
        kwargs["platforms"] = tuple(platforms)
    # Pallas kernels (NMS / landmark window gather) lower to
    # tpu_custom_call, which is not on jax.export's forward-compatibility
    # allowlist — opt in explicitly (artifact is stable within a TPU
    # generation; re-export when retargeting).
    kwargs["disabled_checks"] = (
        jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        jexport.DisabledSafetyCheck.custom_call("Sharding"),
    )
    spec = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    return jexport.export(jax.jit(fn), **kwargs)(spec)


def save_exported(path: str, exported, meta: Dict[str, Any]) -> None:
    """MAGIC + one JSON line + the serialized payload."""
    payload = exported.serialize()
    meta = dict(meta, platforms=list(exported.platforms))
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write((json.dumps(meta) + "\n").encode())
        f.write(payload)


def load_exported(path: str):
    """Load an exported artifact: returns ``(call, meta)`` where
    ``call(images)`` runs the baked pipeline (images must match the
    exported ``(batch, H, W, 3) float32`` contract) and returns the same
    detections dict as ``make_detect_fn``. Needs jax only."""
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path}: not a densebox export artifact")
        meta = json.loads(f.readline().decode())
        payload = f.read()
    exported = jexport.deserialize(payload)
    return exported.call, meta
