"""Pallas greedy-NMS kernel (SURVEY.md §3.2: the TPU equivalent of
torchvision's C++/CUDA NMS is a Pallas kernel, not a Python loop).

Contract identical to densebox_tpu.ops.nms.nms. Design: the (K, K) IoU
matrix is materialized once into VMEM scratch (K<=1024 -> 4 MB, fits), then
the exact sequential greedy sweep runs as a fori_loop of dynamic row reads +
VPU lane ops on the keep vector — no scalar reductions inside the loop
(Mosaic dislikes rank-collapsing float reductions in loop bodies). Candidate
sets are fixed-K score-sorted and validity-masked, matching the framework's
no-dynamic-shapes rule.

The host-side wrapper passes boxes both as (K, 4) and transposed (4, K) so
the kernel can broadcast rows against columns without in-kernel transposes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, boxest_ref, valid_ref, keep_ref, iou_scr,
                *, k: int, iou_thresh: float):
    # columns (K, 1) from the (K, 4) layout; rows (1, K) from the (4, K) one
    c = [boxes_ref[0, :, i:i + 1] for i in range(4)]        # x1,y1,x2,y2 (K,1)
    r = [boxest_ref[0, i:i + 1, :] for i in range(4)]       # (1, K)
    area_c = jnp.maximum(c[2] - c[0], 0.0) * jnp.maximum(c[3] - c[1], 0.0)
    area_r = jnp.maximum(r[2] - r[0], 0.0) * jnp.maximum(r[3] - r[1], 0.0)

    ix1 = jnp.maximum(c[0], r[0])
    iy1 = jnp.maximum(c[1], r[1])
    ix2 = jnp.minimum(c[2], r[2])
    iy2 = jnp.minimum(c[3], r[3])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    iou_scr[:, :] = inter / jnp.maximum(area_c + area_r - inter, 1e-9)

    idx = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    keep_ref[0, :] = valid_ref[0, :]

    def body(i, _):
        # row i of the IoU matrix: dynamic SUBLANE read (lane-dim dynamic
        # indexing needs 128-alignment on TPU; sublane is unconstrained)
        row = iou_scr[pl.ds(i, 1), :]                       # (1, K)
        keep = keep_ref[0:1, :]                             # (1, K) int32
        # pivot's keep bit via integer max-reduce (Mosaic rejects dynamic
        # lane reads and float add-reduces in loop bodies; int max is fine)
        ki = jnp.max(jnp.where(idx == i, keep, 0))
        suppress = (row > iou_thresh) & (idx > i) & (ki > 0)
        keep_ref[0:1, :] = jnp.where(suppress, 0, keep)
        return 0

    lax.fori_loop(0, k, body, 0)


def greedy_keep_pallas(boxes: jnp.ndarray, valid: jnp.ndarray,
                       iou_thresh: float,
                       interpret: Optional[bool] = None) -> jnp.ndarray:
    """keep mask (K,) bool for score-DESC-sorted (K, 4) candidates."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = boxes.shape[0]
    keep = pl.pallas_call(
        functools.partial(_nms_kernel, k=k, iou_thresh=float(iou_thresh)),
        in_specs=[pl.BlockSpec((1, k, 4), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 4, k), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, k), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, k), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.int32),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.float32)],
        interpret=interpret,
    )(boxes[None], jnp.swapaxes(boxes, 0, 1)[None],
      valid.astype(jnp.int32)[None])
    return keep[0] > 0


def nms_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    iou_thresh: float,
    max_out: int,
    interpret: Optional[bool] = None,
    return_idx: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Drop-in replacement for ops.nms.nms backed by the Pallas sweep."""
    k = boxes.shape[0]
    neg_inf = jnp.array(-jnp.inf, scores.dtype)
    order = jnp.argsort(-jnp.where(valid, scores, neg_inf))
    boxes, scores, valid = boxes[order], scores[order], valid[order]

    keep = greedy_keep_pallas(boxes, valid, iou_thresh, interpret)

    out_scores, sel = lax.top_k(jnp.where(keep, scores, neg_inf),
                                min(max_out, k))
    out_boxes = boxes[sel]
    out_valid = keep[sel]
    out_idx = order[sel]
    if max_out > k:
        pad = max_out - k
        out_boxes = jnp.concatenate(
            [out_boxes, jnp.zeros((pad, 4), out_boxes.dtype)])
        out_scores = jnp.concatenate(
            [out_scores, jnp.full((pad,), -jnp.inf, out_scores.dtype)])
        out_valid = jnp.concatenate([out_valid, jnp.zeros((pad,), bool)])
        out_idx = jnp.concatenate([out_idx, jnp.zeros((pad,), out_idx.dtype)])
    if return_idx:
        return out_boxes, out_scores, out_valid, out_idx
    return out_boxes, out_scores, out_valid
