"""Synthetic detection data: learnable rectangles for hermetic tests/demos.

The reference trains on a KITTI-style vehicle set (BASELINE config 5); this
environment has no network, so the test suite and smoke training runs use a
procedural stand-in: bright axis-aligned rectangles over textured noise, with
"landmarks" at the rectangle corners. Trivially learnable — a few dozen SGD
steps must drive the loss down (SURVEY.md §5.3), which is exactly what the
config-4 acceptance test asserts.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from densebox_tpu.config import LabelCfg


def synthetic_batch(
    key: jax.Array,
    batch_size: int,
    label_cfg: LabelCfg,
    max_boxes: int = 4,
    num_landmarks: int = 0,
    image_dtype=None,
) -> Dict[str, jnp.ndarray]:
    """One on-device batch of rectangle patches + padded box tensors.

    ``image_dtype`` mirrors the data pipeline's ``TrainCfg.canvas_dtype``
    delivery contract: generation math stays f32, the stored canvas is
    cast once here (None keeps f32 — bit-exact tests)."""
    ps = label_cfg.patch_size
    std_h = label_cfg.std_height_px
    k_n, k_c, k_h, k_a, k_noise, k_amp = jax.random.split(key, 6)

    n_boxes = jax.random.randint(k_n, (batch_size,), 1, max_boxes + 1)
    slot = jnp.arange(max_boxes)[None, :]
    box_valid = slot < n_boxes[:, None]

    ctr = jax.random.uniform(k_c, (batch_size, max_boxes, 2),
                             minval=0.25 * ps, maxval=0.75 * ps)
    hgt = jax.random.uniform(k_h, (batch_size, max_boxes),
                             minval=0.85 * std_h, maxval=1.2 * std_h)
    asp = jax.random.uniform(k_a, (batch_size, max_boxes),
                             minval=0.8, maxval=1.25)
    wid = hgt * asp
    boxes = jnp.stack([ctr[..., 0] - wid / 2, ctr[..., 1] - hgt / 2,
                       ctr[..., 0] + wid / 2, ctr[..., 1] + hgt / 2], -1)

    xs = jnp.arange(ps, dtype=jnp.float32)[None, None, None, :]  # (1,1,1,P) x
    ys = jnp.arange(ps, dtype=jnp.float32)[None, None, :, None]  # (1,1,P,1) y
    inside = ((xs >= boxes[..., 0, None, None]) &
              (xs <= boxes[..., 2, None, None]) &
              (ys >= boxes[..., 1, None, None]) &
              (ys <= boxes[..., 3, None, None]) &
              box_valid[..., None, None])
    fg = jnp.any(inside, axis=1).astype(jnp.float32)             # (B, P, P)
    amp = jax.random.uniform(k_amp, (batch_size, 1, 1), minval=0.7, maxval=1.0)
    noise = 0.15 * jax.random.normal(k_noise, (batch_size, ps, ps, 3))
    image = fg[..., None] * amp[..., None] + noise
    if image_dtype is not None:
        image = image.astype(image_dtype)

    batch = {"image": image, "boxes": boxes, "box_valid": box_valid}
    if num_landmarks:
        # landmarks at box corners (then cycling), visible when box valid
        corners = jnp.stack([
            boxes[..., (0, 1)], boxes[..., (2, 1)],
            boxes[..., (2, 3)], boxes[..., (0, 3)],
        ], axis=2)                                               # (B, K, 4, 2)
        reps = -(-num_landmarks // 4)
        lms = jnp.tile(corners, (1, 1, reps, 1))[:, :, :num_landmarks]
        batch["landmarks"] = lms
        batch["lm_valid"] = jnp.broadcast_to(
            box_valid[..., None], lms.shape[:3])
    return batch
