"""On-device patch sampling + augmentation (SURVEY.md C7; paper §3.1, §3.4).

The reference crops/augments per sample with host cv2 (partly an offline
patch-crop script). The north star (BASELINE.json:5) orders "image-pyramid
patch cropping, resizing ... batched on TPU, never leave HBM": here the host
only pads full images onto a fixed canvas; everything geometric — anchor
choice, scale/translation jitter, horizontal flip, crop+resize
(jax.image.scale_and_translate), box transformation — happens in one jitted
batched function driven by a threaded PRNG key.

Sampling spec (paper §3.1, §3.4):
  * positive patch: centered on a random anchor box (translation-jittered),
    window sized so the anchor's height lands at std_height_px * u with
    u ~ U[scale_band] after resize to patch_size
  * negative patch: a random window (no anchor), mixed in at neg_frac
  * boxes keep their label if their center stays inside the window
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from densebox_tpu.config import LabelCfg


def sample_patches(
    key: jax.Array,
    images: jnp.ndarray,       # (B, Hc, Wc, 3) canvas-padded full images
    boxes: jnp.ndarray,        # (B, K, 4) xyxy canvas coords (padded)
    box_valid: jnp.ndarray,    # (B, K) bool
    cfg: LabelCfg,
    *,
    neg_frac: float = 0.3,
    max_translate_frac: float = 0.25,
    hflip: bool = True,
    landmarks: Optional[jnp.ndarray] = None,   # (B, K, L, 2)
    lm_valid: Optional[jnp.ndarray] = None,    # (B, K, L) per-landmark
                                               # visibility (real datasets
                                               # mark occluded keypoints)
    crop_dtype=None,                           # compute dtype for the
                                               # crop+resize interpolation;
                                               # None keeps the input dtype
                                               # (bit-exact tests). bf16
                                               # halves the canvas relayout
                                               # + interp-matmul traffic
                                               # (~8% of the train step,
                                               # round-3 profile) for
                                               # sub-8-bit pixel noise.
) -> Dict[str, jnp.ndarray]:
    """One jitted patch-sampling step: full images -> training patches.

    Returns a train_step-ready batch dict (image/boxes/box_valid[/landmarks/
    lm_valid]) with coordinates in patch pixels.
    """
    b, hc, wc, ch = images.shape
    k = boxes.shape[1]
    ps = float(cfg.patch_size)
    k_anchor, k_scale, k_trans, k_neg, k_negpos, k_flip = jax.random.split(key, 6)

    # --- anchor choice: a random valid box per sample -----------------------
    rnd = jax.random.uniform(k_anchor, (b, k))
    anchor_idx = jnp.argmax(jnp.where(box_valid, rnd, -1.0), axis=1)  # (B,)
    has_box = jnp.any(box_valid, axis=1)
    abox = jnp.take_along_axis(boxes, anchor_idx[:, None, None], axis=1)[:, 0]
    a_h = jnp.maximum(abox[:, 3] - abox[:, 1], 1.0)
    a_cx = (abox[:, 0] + abox[:, 2]) * 0.5
    a_cy = (abox[:, 1] + abox[:, 3]) * 0.5

    # --- window geometry ----------------------------------------------------
    lo, hi = cfg.scale_band
    u = jax.random.uniform(k_scale, (b,), minval=lo, maxval=hi)
    # window size so that after resize->ps the anchor height is std_height*u
    win = a_h * ps / (cfg.std_height_px * u)
    jit_xy = jax.random.uniform(k_trans, (b, 2), minval=-max_translate_frac,
                                maxval=max_translate_frac) * win[:, None]
    wx = a_cx + jit_xy[:, 0] - win * 0.5
    wy = a_cy + jit_xy[:, 1] - win * 0.5

    # negative window: random size/position anywhere on the canvas
    neg_size = jax.random.uniform(k_neg, (b,), minval=0.5, maxval=2.0) * ps
    neg_xy = jax.random.uniform(k_negpos, (b, 2)) * \
        (jnp.array([[wc, hc]], jnp.float32) - neg_size[:, None])
    is_neg = (jax.random.uniform(k_flip, (b,)) < neg_frac) | ~has_box
    win = jnp.where(is_neg, neg_size, win)
    wx = jnp.where(is_neg, neg_xy[:, 0], wx)
    wy = jnp.where(is_neg, neg_xy[:, 1], wy)

    # --- crop + resize on device -------------------------------------------
    scale = ps / win                                              # (B,)

    def crop_one(img, s, tx, ty):
        return jax.image.scale_and_translate(
            img, (cfg.patch_size, cfg.patch_size, ch),
            spatial_dims=(0, 1),
            scale=jnp.stack([s, s]),
            translation=jnp.stack([ty, tx]),
            method="linear")

    if crop_dtype is not None:
        images = images.astype(crop_dtype)
    patches = jax.vmap(crop_one)(images, scale, -wx * scale, -wy * scale)

    # --- transform boxes ----------------------------------------------------
    off = jnp.stack([wx, wy, wx, wy], -1)[:, None]                # (B,1,4)
    tb = (boxes - off) * scale[:, None, None]
    cx = (tb[..., 0] + tb[..., 2]) * 0.5
    cy = (tb[..., 1] + tb[..., 3]) * 0.5
    center_in = (cx >= 0) & (cx < ps) & (cy >= 0) & (cy < ps)
    tv = box_valid & center_in

    out: Dict[str, jnp.ndarray] = {}
    if hflip:
        flip = jax.random.uniform(jax.random.fold_in(k_flip, 1), (b,)) < 0.5
        fm = flip[:, None, None]
        patches = jnp.where(fm[..., None], patches[:, :, ::-1], patches)
        tb = jnp.where(
            fm, jnp.stack([ps - 1 - tb[..., 2], tb[..., 1],
                           ps - 1 - tb[..., 0], tb[..., 3]], -1), tb)
        out["flipped"] = flip

    out.update(image=patches, boxes=tb, box_valid=tv)

    if landmarks is not None:
        lm = (landmarks - jnp.stack([wx, wy], -1)[:, None, None]) * \
            scale[:, None, None, None]
        lv = (jnp.broadcast_to(lm_valid, lm.shape[:3])
              if lm_valid is not None
              else jnp.ones(lm.shape[:3], bool))
        if hflip:
            flipped_lm = lm.at[..., 0].set(ps - 1 - lm[..., 0])
            # channel identity swap under mirror (cfg.lm_flip_perm):
            # left/right landmarks trade places, not just coordinates
            if cfg.lm_flip_perm is not None:
                flipped_lm = flipped_lm[:, :, list(cfg.lm_flip_perm), :]
                lv_flipped = lv[:, :, list(cfg.lm_flip_perm)]
                lv = jnp.where(flip[:, None, None], lv_flipped, lv)
            lm = jnp.where(flip[:, None, None, None], flipped_lm, lm)
        out["landmarks"] = lm
        out["lm_valid"] = tv[..., None] & lv
    return out
