"""Requant-only Pallas epilogue (BASELINE.md round-2 profile lever #4).

Round-2 profile: the XLA int8 path's ``clamp_convert`` requant fusions are
~25% of turbo device time — the largest non-conv bucket. The FUSED
conv+requant Pallas kernel (ops/pallas/qconv.py) was measured slower than
XLA's int8 convs end-to-end (its 9-tap MXU dots lose; recorded rejection,
BASELINE.md round 2), so this kernel targets ONLY the elementwise tail:

    int32 conv accumulator -> dequant (in_scale*w_scale) + bias -> ReLU
                           -> requantize by the next layer's input scale
                           -> int8

in one HBM pass (int32 read + int8 write = 5 B/element) instead of the XLA
chain's dequant-to-bf16 fusion followed by the next layer's quantize fusion
(int32 r + bf16 w + bf16 r + int8 w = 9 B/element when XLA fails to merge
them across the layer boundary). The convs stay XLA's (the measured
winner); ``models/quant.py _forward_hybrid`` wires the combination, and
the A/B verdict lives in BASELINE.md round 3.

Epilogue semantics are bit-identical to qconv's (_qconv_kernel epilogue:
f32 scale + bias, max(0), round, clip [-127, 127]).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(acc_ref, scale_ref, bias_ref, osc_ref, out_ref, *, relu: bool,
            quantize_out: bool):
    y = acc_ref[0].astype(jnp.float32) * scale_ref[0, :] + bias_ref[0, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    if quantize_out:
        q = jnp.round(y * osc_ref[0, :])
        out_ref[0] = jnp.clip(q, -127.0, 127.0).astype(jnp.int8)
    else:
        out_ref[0] = y


def requant_epilogue(
    acc: jnp.ndarray,          # (B, H, W, Cout) int32 conv accumulators
    scale: jnp.ndarray,        # (Cout,) f32 — in_scale * w_scale (dequant)
    bias: jnp.ndarray,         # (Cout,) f32
    out_scale: Optional[jnp.ndarray] = None,  # scalar/(Cout,):
                                              # 1 / next layer's in_scale
    *,
    relu: bool = True,
    tile_h: int = 32,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """One-pass dequant+bias+ReLU+requant. Returns int8 when ``out_scale``
    is given (round/clip exactly as qconv_int8), else f32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w_img, cout = acc.shape
    quantize_out = out_scale is not None
    th = min(tile_h, h)
    while h % th:
        th -= 1

    scale2 = jnp.broadcast_to(scale.astype(jnp.float32), (cout,))[None, :]
    bias2 = jnp.broadcast_to(bias.astype(jnp.float32), (cout,))[None, :]
    osc = (jnp.broadcast_to(jnp.asarray(out_scale, jnp.float32), (cout,))
           if quantize_out else jnp.zeros((cout,), jnp.float32))[None, :]

    vec_specs = [pl.BlockSpec((1, cout), lambda i, t: (0, 0),
                              memory_space=pltpu.VMEM)] * 3
    return pl.pallas_call(
        functools.partial(_kernel, relu=relu, quantize_out=quantize_out),
        grid=(b, h // th),
        in_specs=[pl.BlockSpec((1, th, w_img, cout),
                               lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM)] + vec_specs,
        out_specs=pl.BlockSpec((1, th, w_img, cout),
                               lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, h, w_img, cout), jnp.int8 if quantize_out else jnp.float32),
        interpret=interpret,
    )(acc, scale2, bias2, osc)
