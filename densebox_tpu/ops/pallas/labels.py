"""Pallas GT rasterizer kernel (SURVEY.md C5 rebuild obligation; the
on-device replacement for the reference's host numpy loops, BASELINE.json:5).

Same contract as densebox_tpu.ops.labels.rasterize_batch. Design: grid over
the batch; each program rasterizes one patch. Boxes stream in as a small
(K, 8) row per sample; the K-box reduction (nearest-center assignment,
gray-zone union) runs as an unrolled VPU loop over running (M, M) min/union
registers held in VMEM — no (B, K, M, M) intermediate ever touches HBM
(the pure-jax twin materializes it and leans on XLA fusion).

Box rows are pre-packed on the host side of the jit (cheap elementwise):
  [cx, cy, rc2, rg2, x1, y1, x2, y2]  (map units; rc2/rg2 negative when the
  box is invalid / out-of-band so the kernel needs no branches).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from densebox_tpu.config import LabelCfg
from densebox_tpu.ops.labels import LM_RADIUS


def _pack_boxes(boxes: jnp.ndarray, box_valid: jnp.ndarray,
                cfg: LabelCfg) -> jnp.ndarray:
    """(B, K, 4) px boxes -> (B, K, 8) kernel rows (see module docstring)."""
    bm = boxes.astype(jnp.float32) / cfg.stride
    x1, y1, x2, y2 = bm[..., 0], bm[..., 1], bm[..., 2], bm[..., 3]
    cx, cy = (x1 + x2) * 0.5, (y1 + y2) * 0.5
    h = y2 - y1
    rc = cfg.rc_ratio * h
    rg = rc + cfg.rnear
    lo, hi = cfg.height_band_map
    in_band = (h >= lo) & (h <= hi) & box_valid
    rc2 = jnp.where(in_band, rc * rc, -1.0)          # -1 => never positive
    rg2 = jnp.where(box_valid, rg * rg, -1.0)        # -1 => never gray
    return jnp.stack([cx, cy, rc2, rg2, x1, y1, x2, y2], axis=-1)


def _kernel(rows_ref, score_ref, loc_ref, ignore_ref, *, m: int, k: int,
            inv_norm: float):
    # Mosaic iota must be integer; cast to f32 after (pallas_guide pitfall 4)
    px = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1).astype(jnp.float32)
    py = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0).astype(jnp.float32)

    best_d2 = jnp.full((m, m), jnp.inf, jnp.float32)
    pos = jnp.zeros((m, m), jnp.bool_)
    gray = jnp.zeros((m, m), jnp.bool_)
    best_box = [jnp.zeros((m, m), jnp.float32) for _ in range(4)]

    for i in range(k):  # static unroll: K is small (<=16)
        row = rows_ref[0, i, :]
        dx = px - row[0]
        dy = py - row[1]
        d2 = dx * dx + dy * dy
        pos_i = d2 <= row[2]
        gray = gray | (d2 <= row[3])
        take = pos_i & (d2 < best_d2)
        best_d2 = jnp.where(take, d2, best_d2)
        pos = pos | pos_i
        for c in range(4):
            best_box[c] = jnp.where(take, row[4 + c], best_box[c])

    posf = pos.astype(jnp.float32)
    score_ref[0] = posf
    ignore_ref[0] = (gray & ~pos).astype(jnp.float32)
    loc_ref[0, 0] = (px - best_box[0]) * inv_norm * posf
    loc_ref[0, 1] = (py - best_box[1]) * inv_norm * posf
    loc_ref[0, 2] = (best_box[2] - px) * inv_norm * posf
    loc_ref[0, 3] = (best_box[3] - py) * inv_norm * posf


def _lm_kernel(rows_ref, lm_ref, *, m: int, k: int, num_lm: int):
    """rows: (K * L, 3) = [lx, ly, r2] (r2 < 0 when invisible/out-of-band)."""
    px = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1).astype(jnp.float32)
    py = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0).astype(jnp.float32)
    for l in range(num_lm):
        hit = jnp.zeros((m, m), jnp.bool_)
        for i in range(k):
            row = rows_ref[0, i * num_lm + l, :]
            dx = px - row[0]
            dy = py - row[1]
            hit = hit | (dx * dx + dy * dy <= row[2])
        lm_ref[0, l] = hit.astype(jnp.float32)


def rasterize_batch_pallas(
    boxes: jnp.ndarray,
    box_valid: jnp.ndarray,
    cfg: LabelCfg,
    landmarks: Optional[jnp.ndarray] = None,
    lm_valid: Optional[jnp.ndarray] = None,
    *,
    interpret: Optional[bool] = None,
) -> Dict[str, jnp.ndarray]:
    """Pallas-backed rasterizer; contract identical to
    ops.labels.rasterize_batch (maps returned NHWC, f32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, k, _ = boxes.shape
    m = cfg.map_size
    rows = _pack_boxes(boxes, box_valid, cfg)

    kern = functools.partial(_kernel, m=m, k=k,
                             inv_norm=float(1.0 / cfg.loc_norm))
    score, loc, ignore = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, k, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, m, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, m, m), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, m), jnp.float32),
            jax.ShapeDtypeStruct((b, 4, m, m), jnp.float32),
            jax.ShapeDtypeStruct((b, m, m), jnp.float32),
        ),
        interpret=interpret,
    )(rows.reshape(b, k, 8))

    posf = score[..., None]
    out = {
        "score": posf,
        "loc": jnp.transpose(loc, (0, 2, 3, 1)),
        "loc_mask": posf,
        "ignore": ignore[..., None],
    }

    if landmarks is not None:
        num_lm = landmarks.shape[2]
        if lm_valid is None:
            lm_valid = jnp.ones(landmarks.shape[:3], bool)
        lmm = landmarks.astype(jnp.float32) / cfg.stride      # (B, K, L, 2)
        lo, hi = cfg.height_band_map
        h = (boxes[..., 3] - boxes[..., 1]) / cfg.stride
        ok = lm_valid & ((h >= lo) & (h <= hi) & box_valid)[..., None]
        r2 = jnp.where(ok, LM_RADIUS * LM_RADIUS, -1.0)
        lm_rows = jnp.concatenate([lmm, r2[..., None]], -1)   # (B, K, L, 3)
        lm = pl.pallas_call(
            functools.partial(_lm_kernel, m=m, k=k, num_lm=num_lm),
            grid=(b,),
            in_specs=[pl.BlockSpec((1, k * num_lm, 3), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, num_lm, m, m), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, num_lm, m, m), jnp.float32),
            interpret=interpret,
        )(lm_rows.reshape(b, k * num_lm, 3))
        out["lm"] = jnp.transpose(lm, (0, 2, 3, 1))
    return out
