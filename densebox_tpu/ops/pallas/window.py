"""Pallas windowed heatmap gather — the landmark-decode hot path.

Why a kernel (SURVEY.md §3.2 "native equivalents natively"; BASELINE.md
round-2 "Landmark-pipeline throughput"): per-detection window extraction is
a dynamic-index gather, and XLA:TPU lowers a vmapped ``dynamic_slice`` with
per-element offsets to a sequential while loop whose dynamic-update-slice
rewrites the whole stacked window buffer each iteration — profiled at 80%+
of device time in the landmark-enabled pipeline (699 vs 6,028 img/s
det-only). Measured-worse alternatives (take_along_axis gather, chunked
lax.map) are recorded in BASELINE.md. This is the Pallas guide's
scalar-prefetch pattern: window origins arrive as scalar-prefetch operands
(SMEM) and each grid step issues direct HBM→VMEM DMAs — no loop-carried
buffer, no serialization.

Two Mosaic constraints shape the implementation (both measured on v5e):

* DMA slices of an HBM array need 8-aligned sublane / 128-aligned lane
  offsets AND extents ("Slice shape along dimension N must be aligned to
  tiling"). Windows are win~32 at arbitrary origins, so the kernel DMAs an
  aligned (STRIP_H, STRIP_W) = (40, 256) superset strip per (detection,
  landmark) and extracts the exact (win, win) window in-kernel with two
  one-hot selection matmuls on the MXU (row pick then column pick — each
  output element is a single 1.0*value product, so the result is
  bit-identical to a copy; no dynamic VMEM slicing needed).
* scalar-prefetch operands live in SMEM (~1 MB) with their last dim padded
  to 128 lanes — three separate (B, D, L) index arrays exceed it at
  production shapes. (sel, y0, x0) are therefore packed into ONE int32 word
  per (detection, landmark), shaped (B, D*L): sel*2^28 + y0*2^14 + x0
  (origins < 16384 map px, <=8 pyramid scales).

Contract: ``maps`` is the per-scale landmark heatmaps stacked over a padded
common shape, ``(B, S, L, Hm, Wm)`` — channels-leading so a window is a 2-D
slice. Origins MUST be pre-clipped to [0, dim_s - win] of the selected
scale (ops/window.py does this); the strip padding the kernel needs beyond
that is applied here, not by callers.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STRIP_H = 40    # 8-aligned sublane extent: win<=32 rows + up to 7 rows of
                # origin-alignment slack (ya = 8-aligned floor of y0)
STRIP_W = 256   # 128-aligned lane extent covering win<=128 at any offset


def _kernel(packed_ref, maps_ref, out_ref, strips, sems, *,
            win: int, num_lm: int, dp: int, ha: int, wpad: int,
            shared: bool):
    b = pl.program_id(0)
    dc = pl.program_id(1)

    def unpack(j, l):
        if shared:
            word = packed_ref[b, dc * dp + j]
        else:
            word = packed_ref[b, (dc * dp + j) * num_lm + l]
        s = word >> 28
        y0 = (word >> 14) & 0x3FFF
        x0 = word & 0x3FFF
        ya = jnp.clip((y0 // 8) * 8, 0, ha - STRIP_H)
        xa = jnp.clip((x0 // 128) * 128, 0, wpad - STRIP_W)
        return s, y0, x0, ya, xa

    def dma(j, l):
        s, _, _, ya, xa = unpack(j, l)
        ys = pl.ds(pl.multiple_of(ya, 8), STRIP_H)
        xs = pl.ds(pl.multiple_of(xa, 128), STRIP_W)
        if shared:
            # identical origins for every landmark channel (anchor-less
            # decode): ONE (L, STRIP_H, STRIP_W) copy per detection — the
            # kernel is DMA-issue-rate-bound at production shapes (131k
            # windows), so fusing L into the copy is a measured 4x on the
            # issue count
            return pltpu.make_async_copy(
                maps_ref.at[b, s, :, ys, xs], strips.at[j], sems.at[j, 0])
        return pltpu.make_async_copy(
            maps_ref.at[b, s, l, ys, xs], strips.at[j, l], sems.at[j, l])

    lanes = (0,) if shared else tuple(range(num_lm))
    for j in range(dp):
        for l in lanes:
            dma(j, l).start()
    for j in range(dp):
        for l in lanes:
            dma(j, l).wait()
        for l in range(num_lm):
            _, y0, x0, ya, xa = unpack(j, l)
            # one-hot row/column pickers: exact single-term products (every
            # output element is 1.0 * value once, so the extraction is a
            # bit-exact copy in ANY dtype; f32 accumulation costs nothing)
            rio = jax.lax.broadcasted_iota(jnp.int32, (win, STRIP_H), 1)
            rof = jax.lax.broadcasted_iota(jnp.int32, (win, STRIP_H), 0)
            rsel = (rio == (y0 - ya) + rof).astype(strips.dtype)
            cio = jax.lax.broadcasted_iota(jnp.int32, (STRIP_W, win), 0)
            cof = jax.lax.broadcasted_iota(jnp.int32, (STRIP_W, win), 1)
            csel = (cio == (x0 - xa) + cof).astype(strips.dtype)
            rows = jnp.dot(rsel, strips[j, l],
                           preferred_element_type=jnp.float32)
            out_ref[0, j, l] = jnp.dot(
                rows.astype(strips.dtype), csel,
                preferred_element_type=jnp.float32).astype(out_ref.dtype)


# SMEM budget for the packed index operand (the 1 MB scalar memory is
# shared; leave headroom). Bigger batches are chunked on the host side.
# 128K words = 512 KB covers the production shapes (B256 x D128 x L4)
# without chunking — the chunked concatenate was measured to break XLA's
# decode-math fusion (pad/maximum concat lowering, round 3).
_MAX_WORDS = 128 * 1024


def gather_windows_pallas(
    maps: jnp.ndarray,   # (B, S, L, Hm, Wm) f32/bf16 stacked padded heatmaps
    sel: jnp.ndarray,    # (B, D) int32 selected scale per detection
    y0: jnp.ndarray,     # (B, D, L) | (B, D, 1) int32 origins (pre-clipped)
    x0: jnp.ndarray,     # same shape as y0
    win: int,
    *,
    dp: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:        # (B, D, L, win, win), maps.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, s, num_lm, hm, wm = maps.shape
    d = sel.shape[1]
    # (B, D, 1) origins = every landmark channel shares its detection's
    # window (anchor-less decode) -> single fused-L DMA per detection
    shared = y0.shape[2] == 1 and num_lm > 1
    # the aligned strip must hold the window PLUS the origin-alignment
    # slack (ya = 8-aligned floor of y0 -> up to 7 rows; xa = 128-aligned
    # floor of x0 -> up to 127 lanes); beyond these the one-hot pickers
    # would target rows/cols outside the strip and silently return zeros
    if win > STRIP_H - 7 or win > STRIP_W - 127:
        raise ValueError(
            f"window {win} exceeds the strip geometry (max "
            f"{min(STRIP_H - 7, STRIP_W - 127)} with STRIP_H={STRIP_H}, "
            f"STRIP_W={STRIP_W}) — use the jax window backend")
    if s > 8 or hm > 0x3FFF or wm > 0x3FFF:
        raise ValueError(
            f"packed-index limits exceeded: {s} scales (<=8), map "
            f"{hm}x{wm} (<16384) — use the jax window backend")

    # pad to the aligned strip geometry; pad values are never selected
    # (origins are clipped to the real map region by the caller)
    ha = max(STRIP_H, -(-hm // 8) * 8)
    wpad = max(STRIP_W, -(-wm // 128) * 128)
    if (ha, wpad) != (hm, wm):
        maps = jnp.pad(maps, ((0, 0), (0, 0), (0, 0),
                              (0, ha - hm), (0, wpad - wm)))
    dtype = maps.dtype
    if dtype not in (jnp.float32, jnp.bfloat16):
        maps = maps.astype(jnp.float32)
        dtype = jnp.float32

    packed = ((sel.astype(jnp.int32)[..., None] << 28)
              | (y0.astype(jnp.int32) << 14)
              | x0.astype(jnp.int32)).reshape(b, -1)

    # detections per grid step: amortize per-step pipeline overhead. The
    # kernel is DMA-issue-rate-bound at production shapes, so dp is the
    # in-flight-copy depth knob. Measured policy (round-4 A/B,
    # BASELINE.md): 16 — 4,213 vs 4,123 img/s (+2.2%) on turbo lm4 with
    # bf16 maps (dp 16 alone over f32 was +1.5%/noise; the halved DMA
    # bytes are what let the deeper queue pay). Override via the dp arg.
    # VMEM scratch is dp*L*STRIP_H*STRIP_W*4B — dp 16, L 4 is ~2.6 MB
    # even in f32, well inside VMEM.
    if dp is None:
        dp = next(c for c in (16, 8, 4, 2, 1) if d % c == 0)
    elif d % dp:
        raise ValueError(f"dp {dp} must divide the detection count {d}")

    def call(maps_c, packed_c):
        bc = maps_c.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bc, d // dp),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # maps stay in HBM
            out_specs=pl.BlockSpec((1, dp, num_lm, win, win),
                                   lambda bi, di, *_: (bi, di, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((dp, num_lm, STRIP_H, STRIP_W), dtype),
                pltpu.SemaphoreType.DMA((dp, num_lm)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel, win=win, num_lm=num_lm, dp=dp, ha=ha,
                              wpad=wpad, shared=shared),
            out_shape=jax.ShapeDtypeStruct((bc, d, num_lm, win, win),
                                           dtype),
            grid_spec=grid_spec,
            interpret=interpret,
        )(packed_c, maps_c)

    words_per_b = packed.shape[1]
    chunk = max(1, min(b, _MAX_WORDS // max(words_per_b, 1)))
    if chunk >= b:
        return call(maps, packed)
    outs = [call(maps[i:i + chunk], packed[i:i + chunk])
            for i in range(0, b, chunk)]
    return jnp.concatenate(outs, axis=0)
