"""Dump per-landmark error distribution on the lm4 cert checkpoint."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np, jax, jax.numpy as jnp
from densebox_tpu.infer import make_detect_fn
from densebox_tpu.models import DenseBox
from densebox_tpu.train.checkpoint import load_for_inference
from densebox_tpu.data import synthetic_batch
from densebox_tpu.cli import _match_landmarks

cfg, params = load_for_inference("/tmp/densebox_cert/fast-s2d2-w0.5-lm4/ckpt")
model = DenseBox(cfg.model)
detect = make_detect_fn(model, cfg.infer, cfg.label)

canvas_cfg = type(cfg.label)(patch_size=4 * cfg.label.patch_size,
                             std_height_px=cfg.label.std_height_px)
errs = []
for i in range(4):
    b = synthetic_batch(jax.random.key(1_000_000 + i), 8, canvas_cfg,
                        max_boxes=cfg.train.max_boxes,
                        num_landmarks=cfg.model.num_landmarks)
    dets = detect(params, b["image"])
    for pred, gt, h, vis in _match_landmarks(
            {k: np.asarray(v) for k, v in dets.items()}, b):
        e = np.linalg.norm(np.asarray(pred) - np.asarray(gt), axis=-1) / h
        e = np.where(np.asarray(vis), e, np.nan)
        errs.append(e)
errs = np.stack(errs)          # (N, L)
flat = errs.ravel()
flat = flat[~np.isnan(flat)]
print("n:", flat.size, "mean:", round(float(flat.mean()), 4))
for q in (50, 75, 90, 95, 99):
    print(f"p{q}:", round(float(np.percentile(flat, q)), 4))
print("frac > 0.25:", round(float((flat > 0.25).mean()), 4))
print("frac > 0.5:", round(float((flat > 0.5).mean()), 4))
print("per-landmark mean:", np.round(np.nanmean(errs, axis=0), 4))
