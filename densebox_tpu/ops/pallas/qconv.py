"""Fused int8 conv + requant Pallas kernel (SURVEY.md §3.2 native-kernel
obligations; BASELINE.md round-2 lever "fused requant-conv").

Why this exists: the XLA int8 inference path (models/quant.py) lowers each
conv as  int8 conv -> int32 HBM tensor -> elementwise fusion (dequant + bias
+ relu) -> bf16 -> next layer's quantize -> int8.  At slim production widths
the pipeline is HBM-bandwidth-bound, and that chain moves ~9 bytes per
activation element (int32 write+read, bf16 write+read, int8 write). This
kernel fuses the whole per-layer chain into one Pallas program:

    int8 activations  --pipelined block fetch-->  VMEM
    9x (or 1x) MXU dots, int32 accumulation
    epilogue in VMEM: f32 scale (in_scale * w_scale), + bias, ReLU,
                      requantize by the NEXT layer's input scale
    int8 activations  <--pipelined block write--  HBM

so HBM traffic per layer is ~2 bytes/element (int8 in + int8 out) and the
intermediate int32/bf16 tensors never exist.

Design notes (TPU):
  * Grid = (batch, H-tiles); batch is the slow grid axis so the
    VMEM-resident weight matrix is reused across all tiles of an image.
  * Halo rows ride the AUTOMATIC Pallas pipeline (double-buffered block
    fetches) instead of manual DMA: the input is passed three times with
    shifted index maps — TH interior rows, the row above, the row below.
    Edge tiles clamp the halo index map and the kernel zeroes those rows
    (@pl.when), giving genuine SAME zero padding with no padded copy of
    the activation tensor in HBM.
  * Each 3x3 tap is one MXU dot: the (TH, WP, Cin) shifted window reshapes
    to (TH*WP, Cin) — a layout no-op because the scratch width WP is padded
    to the int8 sublane tile (32); the alignment tail is zero columns that
    are cropped on store.
  * Weights are pre-reshaped to (k*k*Cin, Cout) so the taps are contiguous
    row-blocks of one VMEM-resident matrix.
  * Output quantization uses the next layer's input scale (chain calibrated
    by models/quant.quantize_densebox); ``out_scale=None`` keeps f32 output
    (used for the final head convs whose consumers are decode/loss).

The reference has no analog (its conv stack is inherited cuDNN work,
SURVEY.md §3.2) — this is the TPU-native equivalent of a fused CUDA conv
kernel for the production inference path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _qconv_kernel(x_mid, x_up, x_dn, w_ref, scale_ref, bias_ref, oscale_ref,
                  out_ref, x_scr, acc_scr, *, th: int, w_img: int, wp: int,
                  cin: int, cout: int, ksize: int, relu: bool,
                  quantize_out: bool):
    """One (batch, h-tile) block.

    x_mid: (1, TH, W, Cin) int8 — the tile's own rows
    x_up/x_dn: (1, p, W, Cin) int8 — halo rows (clamped at image edges;
               zeroed in-kernel there). Present only for ksize==3.
    w_ref:   (k*k*Cin, Cout) int8 in VMEM
    scale_ref/bias_ref/oscale_ref: (1, Cout) f32 in VMEM
    out_ref: (1, TH, W, Cout) VMEM block (int8 or f32)
    x_scr:   (TH+2p, WP+2p, Cin) int8 scratch (WP = W rounded up to 32)
    acc_scr: (TH*WP, Cout) int32 scratch
    """
    t = pl.program_id(1)
    p = ksize // 2

    # zero-seed so H/W borders and the W-alignment tail are true zeros
    x_scr[...] = jnp.zeros_like(x_scr)
    x_scr[pl.ds(p, th), pl.ds(p, w_img), :] = x_mid[0]
    if p:
        @pl.when(t > 0)
        def _():
            x_scr[pl.ds(0, p), pl.ds(p, w_img), :] = x_up[0]

        @pl.when(t < pl.num_programs(1) - 1)
        def _():
            x_scr[pl.ds(th + p, p), pl.ds(p, w_img), :] = x_dn[0]

    acc_scr[...] = jnp.zeros_like(acc_scr)
    for dy in range(ksize):
        for dx in range(ksize):
            tap = x_scr[pl.ds(dy, th), pl.ds(dx, wp), :]      # (TH, WP, Cin)
            tap2d = tap.reshape(th * wp, cin)
            wk = w_ref[pl.ds((dy * ksize + dx) * cin, cin), :]
            acc_scr[...] += jax.lax.dot_general(
                tap2d, wk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

    acc = acc_scr[...].reshape(th, wp, cout)[:, :w_img, :]
    y = acc.astype(jnp.float32) * scale_ref[0, :] + bias_ref[0, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    if quantize_out:
        q = jnp.round(y * oscale_ref[0, :])
        out_ref[0] = jnp.clip(q, -127.0, 127.0).astype(jnp.int8)
    else:
        out_ref[0] = y


def qconv_int8(
    x: jnp.ndarray,            # (B, H, W, Cin) int8
    w: jnp.ndarray,            # (k, k, Cin, Cout) int8
    scale: jnp.ndarray,        # (Cout,) f32 — in_scale * w_scale (dequant)
    bias: jnp.ndarray,         # (Cout,) f32
    out_scale: Optional[jnp.ndarray] = None,  # scalar or (Cout,) f32:
                                              # 1 / next layer's in_scale
    *,
    relu: bool = True,
    tile_h: int = 8,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused int8 conv (+bias+ReLU+requant). SAME padding, stride 1.

    Returns int8 (B, H, W, Cout) when ``out_scale`` is given (values are
    round(y * out_scale) clipped to [-127, 127]), else f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w_img, cin = x.shape
    k, k2, cin_w, cout = w.shape
    assert k == k2 and cin_w == cin and k in (1, 3), (k, k2, cin)
    p = k // 2
    th = min(tile_h, h)
    while h % th:
        th -= 1
    n_tiles = h // th
    wp = _round_up(w_img, 32)           # int8 sublane tile
    quantize_out = out_scale is not None

    wmat = w.reshape(k * k * cin, cout)
    scale2 = jnp.broadcast_to(scale.astype(jnp.float32), (cout,))[None, :]
    bias2 = jnp.broadcast_to(bias.astype(jnp.float32), (cout,))[None, :]
    osc = (jnp.broadcast_to(jnp.asarray(out_scale, jnp.float32), (cout,))
           if quantize_out else jnp.zeros((cout,), jnp.float32))[None, :]

    out_dtype = jnp.int8 if quantize_out else jnp.float32
    kernel = functools.partial(
        _qconv_kernel, th=th, w_img=w_img, wp=wp, cin=cin, cout=cout,
        ksize=k, relu=relu, quantize_out=quantize_out)

    # Halo rows via shifted index maps over a (1, row)-blocked view. The
    # maps are in block units: the row-blocked specs use block height p, so
    # halo block index for tile t is the row index divided by p — with p=1
    # that's the row itself, clamped at the edges (kernel zeroes those).
    def mid_idx(i, t):
        return (i, t, 0, 0)

    def up_idx(i, t):
        return (i, jnp.maximum(t * th - 1, 0), 0, 0)

    def dn_idx(i, t):
        return (i, jnp.minimum(t * th + th, h - 1), 0, 0)

    x_specs = [pl.BlockSpec((1, th, w_img, cin), mid_idx,
                            memory_space=pltpu.VMEM)]
    inputs = [x]
    if p:
        x_specs += [pl.BlockSpec((1, 1, w_img, cin), up_idx,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, w_img, cin), dn_idx,
                                 memory_space=pltpu.VMEM)]
        inputs += [x, x]
    else:
        # 1x1 conv: no halo operands; bind dummies so the kernel signature
        # is uniform (they are never read when p == 0). The dummies are
        # 1-row arrays, so their index map must pin the row block to 0 —
        # mid_idx's (i, t, ...) would be out of bounds for t > 0 and only
        # "worked" via TPU OOB-clamp semantics (advisor finding, round 2).
        x_specs += [pl.BlockSpec((1, 1, w_img, cin), lambda i, t: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)] * 2
        inputs += [x[:, :1], x[:, :1]]

    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=x_specs + [
            pl.BlockSpec((k * k * cin, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w_img, cout),
                               lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_img, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * p, wp + 2 * p, cin), jnp.int8),
            pltpu.VMEM((th * wp, cout), jnp.int32),
        ],
        interpret=interpret,
    )(*inputs, wmat, scale2, bias2, osc)


def qconv_reference(x, w, scale, bias, out_scale=None, *, relu=True):
    """jnp twin of qconv_int8 (tests + non-TPU fallback). Bit-exact contract:
    int32 accumulation, f32 epilogue, the same round/clip."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    p = w.shape[0] // 2
    acc = jax.lax.conv_general_dilated(
        x, w, (1, 1), padding=((p, p), (p, p)), dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_scale is None:
        return y
    return jnp.clip(jnp.round(y * out_scale), -127, 127).astype(jnp.int8)
