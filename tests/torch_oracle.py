"""PyTorch parity oracle for the DenseBox model (SURVEY.md §5.1).

The reference repo's source is unavailable (empty mount, SURVEY.md §0), so the
oracle is a minimal functional-torch mirror of the paper architecture, built
from the SAME trunk plan as the Flax model (densebox_tpu/models/densebox.py
TRUNK_PLAN) and driven with the SAME weights. It exists solely to pin the
1e-4 per-pixel heatmap-fidelity target (BASELINE.json:5) against an
independent framework's conv/upsample numerics. If the real reference ever
appears, swap this file for it and re-freeze.

torch is CPU-only here; eval mode (no dropout), f32.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from densebox_tpu.models.densebox import TRUNK_PLAN


def _conv(x: torch.Tensor, p, pad: int) -> torch.Tensor:
    # flax kernel HWIO -> torch OIHW
    w = torch.from_numpy(np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)).copy())
    b = torch.from_numpy(np.asarray(p["bias"]).copy())
    return F.conv2d(x, w, b, padding=pad)


def _head(x: torch.Tensor, params, prefix: str) -> torch.Tensor:
    x = F.relu(_conv(x, params[f"{prefix}_conv1"], pad=0))
    return _conv(x, params[f"{prefix}_conv2"], pad=0)


def oracle_forward(flax_params, images_nhwc: np.ndarray, cfg):
    """Run the torch mirror. Returns dict of NHWC numpy maps (f32)."""
    params = flax_params["params"]
    x = torch.from_numpy(
        np.transpose(images_nhwc, (0, 3, 1, 2)).copy()).float()

    f3 = None
    for kind, name, _ in TRUNK_PLAN:
        if kind == "conv":
            x = F.relu(_conv(x, params[name], pad=1))
            if name == "conv3_4":
                f3 = x
        else:
            x = F.max_pool2d(x, 2, 2)
    f4_up = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
    feat = torch.cat([f3, f4_up], dim=1)

    out = {
        "score": _head(feat, params["det"], "det"),
        "loc": _head(feat, params["loc"], "loc"),
    }
    if cfg.num_landmarks:
        lm = _head(feat, params["lm"], "lm")
        out["lm"] = lm
        if cfg.use_refine:
            r = torch.cat([out["score"], lm], dim=1)
            for i in range(2):
                r = F.relu(_conv(r, params[f"refine_conv{i + 1}"], pad=1))
            out["refined"] = _conv(r, params["refine_out"], pad=0)

    return {k: np.transpose(v.detach().numpy(), (0, 2, 3, 1))
            for k, v in out.items()}
