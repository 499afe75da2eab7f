"""Greedy IoU-NMS, fully in-graph (SURVEY.md C11, §3.2).

The reference's NMS is a host-side O(n^2) Python loop or torchvision's
C++/CUDA kernel (SURVEY.md C11). The TPU-native equivalent keeps the whole
thing on device with fixed shapes: one (K, K) IoU matrix (a handful of VPU
ops for K<=1024) + a ``lax.fori_loop`` greedy sweep. Because candidates are
sorted by score descending and suppression only ever flows from lower to
higher indices, ``keep[i]`` is final by the time iteration i reads it —
the loop is the exact sequential greedy algorithm, not an approximation.

A Pallas variant lives in densebox_tpu/ops/pallas/nms.py for the hot path.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * \
        jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between (N, 4) and (M, 4) xyxy boxes -> (N, M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_dispatch(boxes, scores, valid, *, iou_thresh, max_out,
                 backend: str = "auto", batch_hint: int = 1,
                 return_idx: bool = False):
    """Backend dispatcher: 'jax', 'pallas', or 'auto'.

    'auto' policy, measured on v5e (round 2, BASELINE.md): under vmap the
    jax path amortizes its K sequential greedy steps across the whole batch
    (one vectorized iteration suppresses for every image at once), while the
    Pallas kernel serializes batch elements through its grid — so Pallas
    wins only when batch*K is small. Measured: B128/K256 jax 0.040 vs pallas
    0.096 ms/img; B8/K1024 jax 1.25 vs pallas 0.82; B1/K1024 jax 5.5 vs
    pallas 4.5. Crossover taken at batch*K <= 8192. Callers inside vmap pass
    ``batch_hint`` (traced dims are invisible here).
    """
    import jax

    if backend == "auto":
        on_tpu = jax.default_backend() == "tpu"
        k = boxes.shape[0]
        backend = ("pallas" if on_tpu and batch_hint * k <= 8192 else "jax")
    if backend == "pallas":
        from densebox_tpu.ops.pallas.nms import nms_pallas

        return nms_pallas(boxes, scores, valid, iou_thresh=iou_thresh,
                          max_out=max_out, return_idx=return_idx)
    return nms(boxes, scores, valid, iou_thresh=iou_thresh, max_out=max_out,
               return_idx=return_idx)


def nms(
    boxes: jnp.ndarray,    # (K, 4) xyxy
    scores: jnp.ndarray,   # (K,)
    valid: jnp.ndarray,    # (K,) bool
    *,
    iou_thresh: float,
    max_out: int,
    return_idx: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Greedy NMS over a fixed-capacity padded candidate set.

    Returns (boxes (max_out, 4), scores (max_out,), valid (max_out,)),
    sorted by score descending — plus, with ``return_idx``, each output
    slot's index into the ORIGINAL candidate array (so callers can carry
    extra per-candidate lanes, e.g. the source pyramid scale, through NMS).
    """
    k = boxes.shape[0]
    neg_inf = jnp.array(-jnp.inf, scores.dtype)
    masked = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-masked)
    boxes, scores, valid = boxes[order], scores[order], valid[order]

    iou = iou_matrix(boxes, boxes)
    idx = jnp.arange(k)

    def body(i, keep):
        alive = keep[i] & valid[i]
        suppress = alive & (iou[i] > iou_thresh) & (idx > i)
        return keep & ~suppress

    keep = lax.fori_loop(0, k, body, valid)

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
