"""On-device dense GT label-map rasterizer (SURVEY.md C5, §4.3; paper §3.1).

The reference rasterizes per-sample with host-side Python/numpy loops inside
``Dataset.__getitem__`` — the CPU bottleneck of its training loop
(SURVEY.md §4.1, BASELINE.json:5 orders it on-device). Here the rasterizer is
a batched, jit-compiled pure function over padded box tensors: the scatter
problem is reformulated as a per-pixel *gather/reduce* over the (B, K, M, M)
pixel-box incidence tensor, which XLA fuses into a handful of VPU passes.
A Pallas kernel backend (densebox_tpu/ops/pallas/labels.py) implements the
same contract for the hot path; both are tested against a numpy loop
reference that mirrors the reference repo's semantics.

Geometry spec (paper §3.1 + SURVEY.md Appendix B; choices where the paper is
ambiguous are documented inline):

  * all geometry in map units (input px / stride)
  * positive region: disc of radius rc = rc_ratio * box_height centered on
    the box center ("scaling factor 0.3 to the box size" — we anchor on
    height, the paper's face-height convention)
  * regression target at a positive pixel p assigned to box b:
    (p_x - x1, p_y - y1, x2 - p_x, y2 - p_y) / loc_norm
  * multi-box overlap: the pixel is assigned to the box whose center is
    nearest (SURVEY.md §8 hard part 4)
  * gray zone (ignore): (a) pixels within rnear of a positive region =
    dilation of the disc by rnear, exact for discs: dist <= rc + rnear;
    (b) the (dilated) disc of any valid box whose height falls outside the
    scale band — out-of-scale objects are neither positive nor negative
  * landmark channels: discs of radius lm_radius (~1 px) at each visible
    landmark of an in-band box (paper §4)
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from densebox_tpu.config import LabelCfg

LM_RADIUS = 1.0  # map units (paper §4: "radius ~1 px")


def rasterize(boxes, box_valid, cfg, landmarks=None, lm_valid=None,
              backend: str = "auto"):
    """Backend dispatcher: 'jax' (XLA-fused, default off-TPU), 'pallas'
    (VMEM kernel, default on TPU), or 'auto'."""
    import chex
    import jax

    # shape/dtype guards (SURVEY.md §5.2): trace-time only, zero runtime cost
    chex.assert_rank(boxes, 3)
    chex.assert_axis_dimension(boxes, 2, 4)
    chex.assert_shape(box_valid, boxes.shape[:2])
    chex.assert_type(box_valid, bool)
    if landmarks is not None:
        chex.assert_rank(landmarks, 4)
        chex.assert_axis_dimension(landmarks, 3, 2)
        chex.assert_shape(landmarks[..., 0], lm_valid.shape)

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jax"
    if backend == "pallas":
        from densebox_tpu.ops.pallas.labels import rasterize_batch_pallas

        return rasterize_batch_pallas(boxes, box_valid, cfg, landmarks,
                                      lm_valid)
    return rasterize_batch(boxes, box_valid, cfg, landmarks, lm_valid)


def rasterize_batch(
    boxes: jnp.ndarray,                  # (B, K, 4) xyxy, patch px coords
    box_valid: jnp.ndarray,              # (B, K) bool
    cfg: LabelCfg,
    landmarks: Optional[jnp.ndarray] = None,   # (B, K, L, 2) xy patch px
    lm_valid: Optional[jnp.ndarray] = None,    # (B, K, L) bool
) -> Dict[str, jnp.ndarray]:
    """Rasterize padded per-patch boxes into dense GT maps.

    Returns dict of f32 maps:
      score:    (B, M, M, 1) in {0, 1}
      loc:      (B, M, M, 4) normalized border distances (0 off-positive)
      loc_mask: (B, M, M, 1) pixels carrying regression targets
      ignore:   (B, M, M, 1) gray-zone pixels (excluded from cls loss)
      lm:       (B, M, M, L) landmark discs            [if landmarks given]
    """
    m = cfg.map_size
    b, k, _ = boxes.shape
    f32 = jnp.float32

    bm = boxes.astype(f32) / cfg.stride                  # (B, K, 4) map units
    x1, y1, x2, y2 = bm[..., 0], bm[..., 1], bm[..., 2], bm[..., 3]
    cx, cy = (x1 + x2) * 0.5, (y1 + y2) * 0.5
    height = y2 - y1
    rc = cfg.rc_ratio * height                           # (B, K)

    lo, hi = cfg.height_band_map
    in_band = (height >= lo) & (height <= hi) & box_valid
    gray_ok = box_valid                                  # any valid box grays

    # pixel grid: pixel (iy, ix) <-> map point (ix, iy) — same convention as
    # ops/decode.py so decode(rasterize(box)) == box exactly.
    px = jnp.arange(m, dtype=f32)[None, :]               # (1, M) x
    py = jnp.arange(m, dtype=f32)[:, None]               # (M, 1) y
    dx = px[None, None] - cx[..., None, None]            # (B, K, M, M)
    dy = py[None, None] - cy[..., None, None]
    dist2 = dx * dx + dy * dy

    rc2 = (rc * rc)[..., None, None]
    rg = rc + cfg.rnear
    rg2 = (rg * rg)[..., None, None]

    pos_k = (dist2 <= rc2) & in_band[..., None, None]
    gray_k = (dist2 <= rg2) & gray_ok[..., None, None]

    pos = jnp.any(pos_k, axis=1)                         # (B, M, M)
    ignore = jnp.any(gray_k, axis=1) & ~pos

    # nearest-center assignment among positive-claiming boxes
    masked_d2 = jnp.where(pos_k, dist2, jnp.inf)
    best = jnp.argmin(masked_d2, axis=1)                 # (B, M, M)

    def take(v):  # (B, K) -> (B, M, M) gathered by assignment
        return jnp.take_along_axis(
            jnp.broadcast_to(v[:, :, None, None], (b, k, m, m)),
            best[:, None], axis=1)[:, 0]

    inv_norm = 1.0 / cfg.loc_norm
    loc = jnp.stack([
        (px[None] - take(x1)) * inv_norm,
        (py[None] - take(y1)) * inv_norm,
        (take(x2) - px[None]) * inv_norm,
        (take(y2) - py[None]) * inv_norm,
    ], axis=-1)
    posf = pos.astype(f32)[..., None]
    loc = loc * posf

    out = {
        "score": posf,
        "loc": loc,
        "loc_mask": posf,
        "ignore": ignore.astype(f32)[..., None],
    }

    if landmarks is not None:
        if lm_valid is None:
            lm_valid = jnp.ones(landmarks.shape[:3], bool)
        lmm = landmarks.astype(f32) / cfg.stride         # (B, K, L, 2)
        xs = jnp.arange(m, dtype=f32)
        ddx = xs[None, None, None, None, :] - lmm[..., 0][..., None, None]
        ddy = xs[None, None, None, :, None] - lmm[..., 1][..., None, None]
        d2 = ddx * ddx + ddy * ddy                       # (B, K, L, M, M)
        ok = (lm_valid & in_band[..., None])[..., None, None]
        hit = jnp.any((d2 <= LM_RADIUS * LM_RADIUS) & ok, axis=1)  # (B, L, M, M)
        out["lm"] = jnp.transpose(hit, (0, 2, 3, 1)).astype(f32)
    return out
