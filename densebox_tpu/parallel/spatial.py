"""Spatial (halo-exchange) sharding — the CNN analog of context/sequence
parallelism (SURVEY.md §3.3 "SP", §6 "long-context" row).

DenseBox has no attention; what scales past one chip's HBM is the *image
plane*. This module runs the full DenseBox forward with the image sharded
along H across a mesh axis: every 3x3 conv exchanges 1-row halos with its
ring neighbors via ``lax.ppermute`` (the same neighbor-exchange topology
ring attention uses, carrying conv halos instead of KV blocks), pooling and
1x1 heads stay local, and the align-corners x2 upsample — a globally-coupled
op — is made exact with per-shard interpolation matrices over halo-extended
rows.

Boundary semantics: ppermute delivers zeros at ring ends, which is exactly
SAME zero-padding — so the sharded forward is numerically IDENTICAL to the
single-device model (asserted in tests), not an approximation.

Constraints: H divisible by (8 * n_shards); inference-only (no dropout).
"""

from __future__ import annotations


from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from densebox_tpu.config import ModelCfg
from densebox_tpu.models.densebox import (interp_matrix_align_corners,
                                          matmul_precision, space_to_depth,
                                          trunk_plan)


def _halo_exchange_rows(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """(B, Hl, W, C) -> (B, Hl+2, W, C): neighbors' edge rows (zeros at the
    top/bottom of the global image = SAME padding)."""
    n = lax.axis_size(axis_name)
    from_above = lax.ppermute(x[:, -1:], axis_name,
                              [(i, i + 1) for i in range(n - 1)])
    from_below = lax.ppermute(x[:, :1], axis_name,
                              [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([from_above, x, from_below], axis=1)


def _conv(x, kernel, bias, *, pad_w: int, pad_h: int, prec):
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=dn, precision=prec)
    return y + bias.astype(x.dtype)


def _shard_upsample_matrices(h_global: int, n: int) -> np.ndarray:
    """(n, 2*hl, hl+2) per-shard align-corners x2 row-interp matrices over
    halo-extended local rows (global rows s*hl-1 .. (s+1)*hl)."""
    full = interp_matrix_align_corners(h_global, 2 * h_global)  # (2H, H)
    hl = h_global // n
    mats = np.zeros((n, 2 * hl, hl + 2), np.float32)
    for s in range(n):
        rows = full[s * 2 * hl:(s + 1) * 2 * hl]       # (2hl, H)
        lo = s * hl - 1
        for j in range(hl + 2):
            g = lo + j
            if 0 <= g < h_global:
                mats[s, :, j] = rows[:, g]
    return mats


def spatial_forward(
    params,
    images: jnp.ndarray,        # (B, H, W, 3); H % (8 * n_shards) == 0
    cfg: ModelCfg,
    mesh: Mesh,
    axis_name: str = "data",
) -> Dict[str, jnp.ndarray]:
    """DenseBox forward with H sharded over ``axis_name``. Returns the same
    stride-4 head maps as DenseBox.apply (global arrays, H-sharded)."""
    n = mesh.shape[axis_name]
    b, h, w, _ = images.shape
    if h % (cfg.min_divisor * n):
        raise ValueError(f"H={h} must be divisible by {cfg.min_divisor * n}")
    dtype = jnp.dtype(cfg.compute_dtype)
    prec = matmul_precision(dtype)
    plan = trunk_plan(cfg)
    f3_tap = [nm for k_, nm, _ in plan
              if k_ == "conv" and nm.startswith("conv3")][-1]
    p = params["params"]

    # stride-8 local height going INTO the upsample, for the matrices
    h4 = h // 8
    up_mats = jnp.asarray(_shard_upsample_matrices(h4, n), dtype)
    aw = jnp.asarray(interp_matrix_align_corners(w // 8, w // 4), dtype)

    def head(x, prefix):
        hp = p[prefix]  # flax nests the _Head module under its name
        x = _conv(x, hp[f"{prefix}_conv1"]["kernel"],
                  hp[f"{prefix}_conv1"]["bias"], pad_w=0, pad_h=0, prec=prec)
        x = jax.nn.relu(x)
        return _conv(x, hp[f"{prefix}_conv2"]["kernel"],
                     hp[f"{prefix}_conv2"]["bias"], pad_w=0, pad_h=0,
                     prec=prec)

    def fwd(x):
        x = x.astype(dtype)
        f3 = None
        for kind, name, _ in plan:
            if kind == "conv":
                xe = _halo_exchange_rows(x, axis_name)
                x = jax.nn.relu(_conv(
                    xe, p[name]["kernel"], p[name]["bias"],
                    pad_w=1, pad_h=0, prec=prec))
                if name == f3_tap:
                    f3 = x
            elif kind == "s2d":
                x = space_to_depth(x, 2)
            elif kind == "s2d4":
                x = space_to_depth(x, 4)
            else:
                x = lax.reduce_window(
                    x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
        f4 = x

        # exact align-corners x2 upsample across the shard boundary:
        f4e = _halo_exchange_rows(f4, axis_name)          # (B, hl+2, W8, C)
        mat = up_mats[lax.axis_index(axis_name)]          # (2hl, hl+2)
        f4r = jnp.einsum("oh,bhwc->bowc", mat, f4e, precision=prec)
        f4u = jnp.einsum("pw,bhwc->bhpc", aw, f4r, precision=prec)

        feat = jnp.concatenate([f3, f4u], axis=-1)
        out = {"score": head(feat, "det").astype(jnp.float32),
               "loc": head(feat, "loc").astype(jnp.float32)}
        if cfg.num_landmarks:
            lm = head(feat, "lm")
            out["lm"] = lm.astype(jnp.float32)
            if cfg.use_refine:
                r = jnp.concatenate([out["score"].astype(dtype), lm], -1)
                for i in range(2):
                    re = _halo_exchange_rows(r, axis_name)
                    r = jax.nn.relu(_conv(
                        re, p[f"refine_conv{i + 1}"]["kernel"],
                        p[f"refine_conv{i + 1}"]["bias"],
                        pad_w=1, pad_h=0, prec=prec))
                out["refined"] = _conv(
                    r, p["refine_out"]["kernel"], p["refine_out"]["bias"],
                    pad_w=0, pad_h=0, prec=prec).astype(jnp.float32)
        return out

    shard = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=P(None, axis_name),
        out_specs=P(None, axis_name),
        check_vma=False)
    images = jax.device_put(images, NamedSharding(mesh, P(None, axis_name)))
    return shard(images)


class SpatialDenseBox:
    """apply()-compatible wrapper running the halo-sharded forward, so the
    standard detect pipeline (infer.make_detect_fn / detect_batch) serves
    images too large for one chip's HBM: the trunk computes H-sharded over
    the mesh; the small stride-4 head maps come back as global arrays and
    decode/NMS run under normal jit sharding."""

    def __init__(self, cfg: ModelCfg, mesh: Mesh, axis_name: str = "data"):
        self.cfg = cfg
        self.mesh = mesh
        self.axis_name = axis_name

    def apply(self, params, images, train: bool = False, rngs=None):
        assert not train, "spatial sharding is inference-only"
        return spatial_forward(params, images, self.cfg, self.mesh,
                               self.axis_name)
