"""Heatmap -> box decode, TPU-native (SURVEY.md C10, §4.5).

The reference decodes on the host with a boolean threshold over the score map
(dynamic candidate count, per-scale .cpu() round-trips — SURVEY.md §4.2). On
TPU dynamic shapes are poison, so decode is a fixed-shape ``lax.top_k`` over
the flattened score map: always K candidates, each with a validity bit
(score > threshold). Downstream (NMS, pyramid concat) is mask-based.

Coordinate convention (shared with the GT rasterizer — decode∘rasterize must
be the identity): map pixel (iy, ix) <-> scaled-image point
(ix * stride, iy * stride); loc channels are (d_left, d_top, d_right,
d_bottom) distances in map units divided by ``loc_norm`` (paper §3.3).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax


def decode_topk(
    score_map: jnp.ndarray,   # (H, W) or (H, W, 1) raw scores
    loc_map: jnp.ndarray,     # (H, W, 4) normalized border distances
    *,
    stride: int,
    loc_norm: float,
    topk: int,
    score_thresh: float,
    scale_x: float = 1.0,     # scaled-image -> original-image factor (x)
    scale_y: float = 1.0,
    approx: bool = False,     # lax.approx_max_k (3x faster on TPU, ~perfect
                              # recall at target 0.95 on dense score maps)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Extract the top-K scoring pixels and decode their boxes.

    Returns (boxes (K, 4) xyxy in original-image coords, scores (K,),
    valid (K,) bool). Fixed shapes; invalid slots hold score -inf boxes 0.
    """
    score_map = score_map.reshape(score_map.shape[0], score_map.shape[1])
    h, w = score_map.shape
    k = min(topk, h * w)

    flat = score_map.reshape(-1)
    if approx and k < h * w:
        scores, idx = lax.approx_max_k(flat, k, recall_target=0.95)
    else:
        scores, idx = lax.top_k(flat, k)
    iy = (idx // w).astype(jnp.float32)
    ix = (idx % w).astype(jnp.float32)

    d = loc_map.reshape(-1, 4)[idx] * loc_norm  # back to map units
    x1 = (ix - d[:, 0]) * stride / scale_x
    y1 = (iy - d[:, 1]) * stride / scale_y
    x2 = (ix + d[:, 2]) * stride / scale_x
    y2 = (iy + d[:, 3]) * stride / scale_y
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)

    valid = scores > score_thresh
    if k < topk:  # pad up to the fixed capacity
        pad = topk - k
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)])
        scores = jnp.concatenate(
            [scores, jnp.full((pad,), -jnp.inf, scores.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return boxes, scores, valid
