"""DenseBox model — TPU-native Flax implementation.

Spec provenance: the reference mount (/root/reference) was empty at build time
(SURVEY.md §0); the architecture follows the DenseBox paper (arXiv:1509.04874
§3.2 and §4) and BASELINE.json:5 (north star):

  * VGG19-derived fully-convolutional trunk through conv4_4
    (conv3_4 @ stride 4 / 256ch, conv4_4 @ stride 8 / 512ch)
  * skip-upsample fusion: bilinear x2 upsample of conv4_4 (align_corners
    semantics, matching torch ``nn.UpsamplingBilinear2d``) concatenated with
    conv3_4 -> 768ch feature map at stride 4
  * det head (1x1 conv 512 -> ReLU -> dropout -> 1x1 conv 1) -> score map
  * loc head (same shape -> 1x1 conv 4) -> distance-to-border offset map
  * optional landmark head (-> N heatmaps) and refinement branch fusing the
    landmark heatmaps with the score map into a refined score (paper §4)

TPU-first choices (not in the reference):
  * NHWC layout throughout (TPU conv-friendly)
  * compute dtype is a config knob (bf16 production inference; f32 parity runs)
  * the x2 bilinear upsample is expressed as two small dense interpolation
    matmuls so it rides the MXU and fuses into the surrounding convs
  * outputs are cast back to f32 so decode/loss numerics are stable
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from densebox_tpu.config import ModelCfg


def matmul_precision(dtype) -> lax.Precision:
    """f32 compute means real f32 math (parity discipline, SURVEY.md §8 hard
    part 1); bf16 compute takes the fast MXU default."""
    return (lax.Precision.HIGHEST if jnp.dtype(dtype) == jnp.float32
            else lax.Precision.DEFAULT)

# (kind, name, base_width). The single source of truth for the trunk topology —
# the torch parity oracle in tests/ walks this same plan so both frameworks
# build byte-identical graphs. f3 is tapped at the end of block 3 ('f3' tag),
# f4 at the end of block 4.
TRUNK_PLAN = (
    ("conv", "conv1_1", 64), ("conv", "conv1_2", 64), ("pool", "pool1", 0),
    ("conv", "conv2_1", 128), ("conv", "conv2_2", 128), ("pool", "pool2", 0),
    ("conv", "conv3_1", 256), ("conv", "conv3_2", 256),
    ("conv", "conv3_3", 256), ("conv", "conv3_4", 256),   # -> f3 (stride 4)
    ("pool", "pool3", 0),
    ("conv", "conv4_1", 512), ("conv", "conv4_2", 512),
    ("conv", "conv4_3", 512), ("conv", "conv4_4", 512),   # -> f4 (stride 8)
)


def trunk_plan(cfg: ModelCfg):
    """Trunk topology for a config. The paper config returns TRUNK_PLAN
    verbatim; the fast configs swap the stem for space-to-depth and trim
    conv3/conv4 blocks to cfg.trunk_depth convs:

      * stem='s2d':  space-to-depth(2) replaces pool1 — conv1/conv2 run at
        stride 2 (the convs after it see the grid pool1 would produce).
      * stem='s2d4': space-to-depth(4) jumps straight to stride 4 — every
        trunk conv runs on the output grid. This kills the full/half-res
        activation tensors entirely; at slim widths the pipeline is
        HBM-bandwidth-bound (BASELINE.md round-2 breakdown), so the win is
        proportional to the bytes removed, not the FLOPs.
    """
    if cfg.stem == "conv" and cfg.trunk_depth == 4:
        return TRUNK_PLAN
    plan = []
    if cfg.stem == "s2d4":
        plan += [("s2d4", "s2d4", 0),
                 ("conv", "conv1_1", 64), ("conv", "conv1_2", 64),
                 ("conv", "conv2_1", 128), ("conv", "conv2_2", 128)]
    elif cfg.stem == "s2d":
        plan += [("s2d", "s2d", 0),
                 ("conv", "conv1_1", 64), ("conv", "conv1_2", 64),
                 ("conv", "conv2_1", 128), ("conv", "conv2_2", 128),
                 ("pool", "pool2", 0)]
    else:
        plan += [("conv", "conv1_1", 64), ("conv", "conv1_2", 64),
                 ("pool", "pool1", 0),
                 ("conv", "conv2_1", 128), ("conv", "conv2_2", 128),
                 ("pool", "pool2", 0)]
    d = cfg.trunk_depth
    plan += [("conv", f"conv3_{i + 1}", 256) for i in range(d)]
    plan += [("pool", "pool3", 0)]
    plan += [("conv", f"conv4_{i + 1}", 512) for i in range(d)]
    return tuple(plan)


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/r, W/r, C*r*r)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, h // r, w // r, c * r * r)


def interp_matrix_align_corners(n_in: int, n_out: int) -> np.ndarray:
    """Dense 1-D bilinear interpolation matrix with align_corners=True semantics.

    Matches ``torch.nn.functional.interpolate(mode='bilinear',
    align_corners=True)``: output sample o maps to input position
    o * (n_in - 1) / (n_out - 1). Returned as a numpy constant so it folds
    into the jitted graph; applying it is a (n_out, n_in) x (n_in, ...) matmul
    that XLA places on the MXU.
    """
    if n_in == 1:
        return np.ones((n_out, 1), np.float32)
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / max(n_out - 1, 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 2)
    w = pos - lo
    m = np.zeros((n_out, n_in), np.float64)
    m[np.arange(n_out), lo] = 1.0 - w
    m[np.arange(n_out), lo + 1] = w
    return m.astype(np.float32)


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """x2 bilinear upsample (align_corners) of an NHWC tensor via two matmuls."""
    _, h, w, _ = x.shape
    prec = matmul_precision(x.dtype)
    ah = jnp.asarray(interp_matrix_align_corners(h, 2 * h), dtype=x.dtype)
    aw = jnp.asarray(interp_matrix_align_corners(w, 2 * w), dtype=x.dtype)
    # W-contraction first: A/B'd against H-first and a single fused einsum
    # on the turbo int8 pipeline (round 3: 6,084 vs 5,978 vs 6,053 img/s,
    # same-session) — all inside the ±2% session noise band; W-first kept
    # as the (weakly) best. The post-matmul relayout copies seen in the
    # pyramid profile are consumer-side and survive every ordering.
    y = jnp.einsum("pw,bhwc->bhpc", aw, x, precision=prec)
    return jnp.einsum("oh,bhwc->bowc", ah, y, precision=prec)


@jax.custom_vjp
def max_pool_2x2_reshape(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 maxpool as reshape + max over the window axes.

    Forward is bit-identical to ``nn.max_pool(x, (2, 2), strides=(2, 2))``
    (same values, no padding involved at even extents). The custom VJP
    routes the gradient to the FIRST maximal element in row-major window
    order — exactly XLA's select_and_scatter tie rule, so backward is also
    bit-identical to the lax.reduce_window path — but as pure elementwise
    ops + two length-2 cumsums, which XLA fuses, instead of the
    select_and_scatter op (1.1 ms/step in the round-3 train profile,
    BASELINE.md)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def _max_pool_2x2_fwd(x):
    y = max_pool_2x2_reshape(x)
    return y, (x, y)


def _max_pool_2x2_bwd(res, g):
    x, y = res
    b, h, w, c = x.shape
    xw = x.reshape(b, h // 2, 2, w // 2, 2, c)
    eq = xw == y[:, :, None, :, None, :]
    # first-max in row-major window order: an element receives the gradient
    # iff it equals the max AND no earlier window element (by rows, then
    # columns within the row) also does — matching select_and_scatter
    rowsum = eq.sum(axis=4, keepdims=True)
    prior_rows = jnp.cumsum(rowsum, axis=2) - rowsum
    prior_cols = jnp.cumsum(eq, axis=4) - eq
    first = eq & ((prior_rows + prior_cols) == 0)
    gx = jnp.where(first, g[:, :, None, :, None, :],
                   jnp.zeros((), g.dtype)).reshape(b, h, w, c)
    return (gx,)


max_pool_2x2_reshape.defvjp(_max_pool_2x2_fwd, _max_pool_2x2_bwd)


def resolved_pool_impl(cfg: ModelCfg) -> str:
    impl = cfg.pool_impl
    if impl == "auto":
        # measured policy (round-4 A/B, BASELINE.md): 'xla' — the reshape
        # backend measured 18.91 vs 22.51 steps/s (−16%) on the fast
        # w0.5/B128 train config: its elementwise tie-break backward over
        # the interleaved (b, h/2, 2, w/2, 2, c) window axes costs far
        # more than the 1.06 ms/step select_and_scatter it replaces.
        # Kept as a wired, equality-tested backend.
        impl = "xla"
    return impl


def _max_pool(x: jnp.ndarray, cfg: ModelCfg) -> jnp.ndarray:
    if resolved_pool_impl(cfg) == "reshape":
        return max_pool_2x2_reshape(x)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class _PackedDropout(nn.Module):
    """Dropout whose mask spends 8 random bits per element instead of 32.

    ``jax.random.bernoulli`` draws one u32 word per element, so the two
    (B, H/4, W/4, head_width) head masks are ~1 GB/step of pure generator
    traffic at production shapes (round-3 train profile, BASELINE.md).
    Here each generated u32 word yields FOUR mask bytes; an element is
    kept iff its byte >= round(rate*256), i.e. the keep probability is
    quantized to 1/256 — exact for the paper's rate 0.5. Same contract as
    flax's Dropout otherwise (inverted scaling by the true keep prob,
    'dropout' RNG collection)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool) -> jnp.ndarray:
        thresh = int(round(self.rate * 256))
        if deterministic or self.rate == 0.0:
            return x
        keep_prob = 1.0 - thresh / 256.0
        key = self.make_rng("dropout")
        c = x.shape[-1]
        if c % 4 or not 0 < thresh < 256:
            # channel count not byte-packable, or rate outside the uint8
            # band (thresh 256 → keep_prob 0 divide-by-zero; thresh 0 →
            # silently no dropout): plain exact-rate bernoulli fallback
            keep_prob = 1.0 - self.rate
            keep = jax.random.bernoulli(key, keep_prob, x.shape)
        else:
            # draw u32 words shaped like x but with a quarter-size minor
            # dim, then expand each word into 4 bytes along that dim — a
            # contiguous minor-dim reshape (a flat whole-array reshape
            # here sent the remote TPU compiler into a 20-minute
            # layout-assignment spiral; measured round 3)
            bits = jax.random.bits(key, x.shape[:-1] + (c // 4,),
                                   jnp.uint32)
            shifts = jnp.asarray([0, 8, 16, 24], jnp.uint32)
            byts = ((bits[..., None] >> shifts)
                    & jnp.uint32(0xFF)).reshape(x.shape)
            keep = byts >= jnp.uint32(thresh)
        return jnp.where(keep, x / keep_prob, jnp.zeros((), x.dtype))


@functools.lru_cache(maxsize=None)
def fused_relu_dropout(rate: float, bits8: bool = False):
    """relu+dropout fused so backward needs NO saved mask.

    Forward draws the same bernoulli mask flax's ``nn.Dropout`` would for
    the same key (bit-identical semantics):
    ``y = where(keep, relu(x)/keep_prob, 0)``. The custom VJP exploits
    ``y > 0  <=>  kept AND x > 0`` (up to the measure-zero x == 0, where
    the relu subgradient is ambiguous anyway): ``dx = g * (y > 0) /
    keep_prob``. Its only residual is y itself — which the following
    conv's weight-grad already keeps — so the ~118M-element bool keep
    masks of the two production head dropouts (round-3 train profile,
    BASELINE.md) are never stored or re-read in backward.

    ``bits8=True`` ('fused8') additionally draws the mask from UINT8
    random bytes (keep iff byte >= round(rate*256); keep probability
    quantized to 1/256 — exact for the paper's 0.5). XLA's
    RngBitGenerator then emits a quarter of the generator words the u32
    bernoulli draw needs — the two head-mask generators were 2.16 ms/step
    EACH in the round-4 train profile — with no user-level pack/unpack
    reshape (the round-3 'packed' backend's remote-compile bomb)."""
    keep_prob = 1.0 - rate
    thresh = int(round(rate * 256))
    if bits8 and not 0 < thresh < 256:
        # thresh == 256 would overflow the uint8 compare (keep_prob 0 →
        # division by zero); thresh == 0 would silently disable dropout
        # for 0 < rate < 1/512. Outside the representable band the u32
        # bernoulli draw is the correct (exact) fallback. (ADVICE r4)
        bits8 = False
    if bits8:
        keep_prob = 1.0 - thresh / 256.0

    @jax.custom_vjp
    def f(x, key):
        if bits8:
            keep = jax.random.bits(key, x.shape, jnp.uint8) >= jnp.uint8(
                thresh)
        else:
            keep = jax.random.bernoulli(key, keep_prob, x.shape)
        return jnp.where(keep, jnp.maximum(x, 0) / keep_prob,
                         jnp.zeros((), x.dtype))

    def fwd(x, key):
        y = f(x, key)
        return y, y

    def bwd(y, g):
        return (jnp.where(y > 0, g / keep_prob,
                          jnp.zeros((), g.dtype)), None)

    f.defvjp(fwd, bwd)
    return f


def resolved_dropout_impl(cfg: ModelCfg) -> str:
    impl = cfg.dropout_impl
    if impl == "auto":
        # measured policy (round-4 A/Bs, BASELINE.md): 'fused8' — the
        # zero-mask-residual relu+dropout VJP ('fused', 22.48 vs 21.84
        # steps/s, +2.9%) PLUS a uint8 RNG draw (23.52 vs 22.51 steps/s,
        # +4.5% — RngBitGenerator emits 4x fewer generator words for the
        # two ~118M-element head masks, which were 2.16 ms/step each in
        # the round-4 profile). Keep probability quantizes to 1/256 —
        # exact for the paper's 0.5 rate. 'packed' remains disqualified
        # as a default by its remote-compile bomb (round 3); 'flax' kept
        # as the reference backend; all wired + equality-tested.
        impl = "fused8"
        if round(cfg.dropout_rate * 256) / 256.0 != cfg.dropout_rate:
            # 'fused8' quantizes the keep probability to a 1/256 grid;
            # when the configured rate is not exactly representable,
            # 'auto' must not silently change semantics — fall back to
            # the exact-rate 'fused' backend (same zero-mask-residual
            # VJP, u32 bernoulli draw). Explicit 'fused8' still opts in.
            impl = "fused"
    return impl


def _dropout(cfg: ModelCfg) -> nn.Module:
    impl = resolved_dropout_impl(cfg)
    if impl == "packed":
        return _PackedDropout(cfg.dropout_rate)
    return nn.Dropout(cfg.dropout_rate)


class _SplitConv1x1(nn.Module):
    """1x1 conv over the CONCEPTUAL concat of two feature tensors, computed
    as two sliced-weight matmuls summed — the concat tensor never exists.

    Parameter tree ({kernel (1,1,Ca+Cb,out), bias}) is byte-identical to
    the ``nn.Conv`` it replaces, so checkpoints are interchangeable and
    the torch-parity oracle needs no changes. Only the f32 accumulation
    order differs (two GEMM partials instead of one 384-wide GEMM)."""

    features: int
    dtype: object
    param_dtype: object
    precision: object

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        ca, cb = a.shape[-1], b.shape[-1]
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (1, 1, ca + cb, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        k = kernel[0, 0].astype(self.dtype)
        y = (jnp.einsum("bhwc,co->bhwo", a.astype(self.dtype), k[:ca],
                        precision=self.precision)
             + jnp.einsum("bhwc,co->bhwo", b.astype(self.dtype), k[ca:],
                          precision=self.precision))
        return y + bias.astype(self.dtype)


class _ConvParams1x1(nn.Module):
    """Parameter-only twin of a 1x1 ``nn.Conv``: declares {kernel, bias}
    with identical shapes, initializers, and scope path, but performs no
    computation — the fused-heads path assembles these into concatenated /
    block-diagonal weights itself."""

    features: int
    in_features: int
    param_dtype: object

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (1, 1, self.in_features, self.features),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return kernel, bias


class _HeadParams(nn.Module):
    """Parameter-only twin of :class:`_Head` (same scope layout:
    ``<name>/<prefix>_conv1`` and ``<name>/<prefix>_conv2``), used by the
    fused-heads path so 'fused' and 'separate' checkpoints are
    byte-interchangeable."""

    cfg: ModelCfg
    out_channels: int
    name_prefix: str
    in_features: int

    @nn.compact
    def __call__(self):
        width = self.cfg.scaled(self.cfg.head_width)
        pdtype = jnp.dtype(self.cfg.param_dtype)
        k1, b1 = _ConvParams1x1(width, self.in_features, pdtype,
                                name=f"{self.name_prefix}_conv1")()
        k2, b2 = _ConvParams1x1(self.out_channels, width, pdtype,
                                name=f"{self.name_prefix}_conv2")()
        return k1, b1, k2, b2


def resolved_skip_fusion(cfg: ModelCfg) -> str:
    sf = cfg.skip_fusion
    if sf == "auto":
        # measured policy (round-4 train ladder, BASELINE.md): 'split'
        # — 21.84 vs 20.86 steps/s (+4.7%) on fast w0.5/B128/240px; it
        # removes the concat tensor + its 2.3 ms/step relayout copy
        # named by the round-3 train profile. Outputs agree with
        # 'concat' to f32-sum-order noise (equality test).
        sf = "split"
    return sf


def resolved_head_impl(cfg: ModelCfg) -> str:
    impl = cfg.head_impl
    if impl == "auto":
        # measured policy (round-5 train A/B, BASELINE.md round-5 ladder):
        # 'fused' — 24.85 vs 23.58 steps/s (+5.4%) on fast w0.5/B128/240px.
        # One conv1 GEMM + one block-diagonal conv2 + ONE dropout mask
        # draw across all heads attacks the 33% heads bucket of the
        # round-4 train profile. Param tree is byte-identical to
        # 'separate'; outputs/grads match to f32-sum-order noise
        # (tests/test_model.py::test_head_impl_fused_*).
        impl = "fused"
    return impl


def _fused_heads(cfg: ModelCfg, feat, spec, *, train: bool, make_rng,
                 dropout_module):
    """All prediction heads as ONE conv1 GEMM + ONE block-diagonal conv2.

    ``spec`` is ((name_prefix, out_channels), ...). Must run inside
    DenseBox's compact context (module instantiation registers the
    per-head params as direct children, exactly where _Head would put
    them). Returns {prefix: (B, H, W, out_channels)}.

    Math identity vs separate heads: conv1 weights concatenate along Cout
    (independent GEMM columns); conv2 weights form a block-diagonal
    (W*n_heads, sum(out)) matrix whose off-blocks are exact zeros — each
    output element's accumulation picks up only its own head's terms, so
    values match 'separate' to f32-sum-order noise (equality-tested).
    Gradients are exact: the concat/zero-pad assemblies transpose to
    slices, so each head's param grads are untouched by the fusion.
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    prec = matmul_precision(dtype)
    width = cfg.scaled(cfg.head_width)
    if isinstance(feat, tuple):
        cin = feat[0].shape[-1] + feat[1].shape[-1]
    else:
        cin = feat.shape[-1]
    hp = [_HeadParams(cfg, oc, pfx, cin, name=pfx)() for pfx, oc in spec]

    k1 = jnp.concatenate([p[0] for p in hp], axis=-1)[0, 0].astype(dtype)
    b1 = jnp.concatenate([p[1] for p in hp], axis=-1).astype(dtype)
    if isinstance(feat, tuple):
        a, b = feat
        ca = a.shape[-1]
        y = (jnp.einsum("bhwc,co->bhwo", a.astype(dtype), k1[:ca],
                        precision=prec)
             + jnp.einsum("bhwc,co->bhwo", b.astype(dtype), k1[ca:],
                          precision=prec)) + b1
    else:
        y = jnp.einsum("bhwc,co->bhwo", feat.astype(dtype), k1,
                       precision=prec) + b1

    rate = cfg.dropout_rate
    impl = resolved_dropout_impl(cfg)
    if train and rate > 0.0 and impl in ("fused", "fused8"):
        y = fused_relu_dropout(rate, bits8=impl == "fused8")(
            y, make_rng("dropout"))
    else:
        y = nn.relu(y)
        y = dropout_module(y, deterministic=not train)

    outs = [oc for _, oc in spec]
    k2 = jnp.zeros((width * len(spec), sum(outs)), dtype)
    o = 0
    for i, p in enumerate(hp):
        k2 = lax.dynamic_update_slice(
            k2, p[2][0, 0].astype(dtype), (i * width, o))
        o += outs[i]
    b2 = jnp.concatenate([p[3] for p in hp], axis=-1).astype(dtype)
    z = jnp.einsum("bhwc,co->bhwo", y, k2, precision=prec) + b2

    res, o = {}, 0
    for (pfx, oc) in spec:
        res[pfx] = z[..., o:o + oc]
        o += oc
    return res


class _Head(nn.Module):
    """1x1-conv prediction head: conv(head_width) -> ReLU -> dropout -> conv(out).

    Dropout placement per paper §3.2 / SURVEY.md C3 (between the two head convs).
    The input is either the fused skip tensor or, under
    ``ModelCfg.skip_fusion='split'``, the (f3, upsampled-f4) pair — see
    :class:`_SplitConv1x1` (same parameters either way)."""

    cfg: ModelCfg
    out_channels: int
    name_prefix: str

    @nn.compact
    def __call__(self, x, *, train: bool) -> jnp.ndarray:
        dtype = jnp.dtype(self.cfg.compute_dtype)
        pdtype = jnp.dtype(self.cfg.param_dtype)
        prec = matmul_precision(dtype)
        width = self.cfg.scaled(self.cfg.head_width)
        if isinstance(x, tuple):
            x = _SplitConv1x1(width, dtype, pdtype, prec,
                              name=f"{self.name_prefix}_conv1")(*x)
        else:
            x = nn.Conv(width, (1, 1), dtype=dtype,
                        param_dtype=pdtype, precision=prec,
                        kernel_init=nn.initializers.he_normal(),
                        name=f"{self.name_prefix}_conv1")(x)
        rate = self.cfg.dropout_rate
        impl = resolved_dropout_impl(self.cfg)
        if train and rate > 0.0 and impl in ("fused", "fused8"):
            x = fused_relu_dropout(rate, bits8=impl == "fused8")(
                x, self.make_rng("dropout"))
        else:
            x = nn.relu(x)
            x = _dropout(self.cfg)(x, deterministic=not train)
        x = nn.Conv(self.out_channels, (1, 1), dtype=dtype, param_dtype=pdtype,
                    precision=prec, kernel_init=nn.initializers.he_normal(),
                    name=f"{self.name_prefix}_conv2")(x)
        return x


class DenseBox(nn.Module):
    """The DenseBox FCN. Input NHWC images (H, W divisible by 8); outputs a dict
    of stride-4 dense maps, all cast to float32:

      score: (B, H/4, W/4, 1)   raw detection score (L2-trained, no sigmoid)
      loc:   (B, H/4, W/4, 4)   normalized (d_left, d_top, d_right, d_bottom)
      lm:    (B, H/4, W/4, N)   landmark heatmaps          [if num_landmarks]
      refined: (B, H/4, W/4, 1) landmark-fused score       [if use_refine]
    """

    cfg: ModelCfg

    @nn.compact
    def __call__(self, images: jnp.ndarray, *, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        if images.shape[1] % cfg.min_divisor or images.shape[2] % cfg.min_divisor:
            raise ValueError(
                f"input H,W must be divisible by {cfg.min_divisor}, "
                f"got {images.shape}")

        prec = matmul_precision(dtype)
        x = images.astype(dtype)
        plan = trunk_plan(cfg)
        f3_tap = [n for k_, n, _ in plan
                  if k_ == "conv" and n.startswith("conv3")][-1]
        f3 = None
        for kind, name, width in plan:
            if kind == "conv":
                x = nn.Conv(cfg.scaled(width), (3, 3), padding="SAME",
                            dtype=dtype, param_dtype=pdtype, precision=prec,
                            kernel_init=nn.initializers.he_normal(),
                            name=name)(x)
                x = nn.relu(x)
                if name == f3_tap:
                    f3 = x
            elif kind == "s2d":
                x = space_to_depth(x, 2)
            elif kind == "s2d4":
                x = space_to_depth(x, 4)
            else:
                x = _max_pool(x, cfg)
        f4 = x

        sf = resolved_skip_fusion(cfg)
        up = upsample2x_align_corners(f4)
        # 'split' hands each head the (f3, up) pair; _SplitConv1x1 folds the
        # concat into its sliced-weight matmuls so the (B, H/4, W/4, 384)
        # concat tensor (+ its relayout copy, 2.3 ms/step in the round-3
        # train profile) never materializes. Identical parameters.
        feat = ((f3, up) if sf == "split"
                else jnp.concatenate([f3, up], axis=-1))

        spec = [("det", 1), ("loc", 4)]
        if cfg.num_landmarks:
            spec.append(("lm", cfg.num_landmarks))
        if resolved_head_impl(cfg) == "fused":
            maps = _fused_heads(cfg, feat, tuple(spec), train=train,
                                make_rng=self.make_rng,
                                dropout_module=_dropout(cfg))
            score, loc = maps["det"], maps["loc"]
        else:
            score = _Head(cfg, 1, "det", name="det")(feat, train=train)
            loc = _Head(cfg, 4, "loc", name="loc")(feat, train=train)
            maps = {}
        out = {"score": score.astype(jnp.float32),
               "loc": loc.astype(jnp.float32)}

        if cfg.num_landmarks:
            lm = (maps["lm"] if "lm" in maps else
                  _Head(cfg, cfg.num_landmarks, "lm", name="lm")(
                      feat, train=train))
            out["lm"] = lm.astype(jnp.float32)
            if cfg.use_refine:
                # Refinement branch (paper §4): fuse raw score + landmark
                # heatmaps through a small conv stack into a refined score.
                # Exact refine-branch widths are our spec choice (reference
                # absent); documented here as 3x3(refine_width) -> ReLU ->
                # 3x3(refine_width) -> ReLU -> 1x1(1).
                r = jnp.concatenate([score, lm], axis=-1)
                for i in range(2):
                    r = nn.Conv(cfg.refine_width, (3, 3), padding="SAME",
                                dtype=dtype, param_dtype=pdtype, precision=prec,
                                kernel_init=nn.initializers.he_normal(),
                                name=f"refine_conv{i + 1}")(r)
                    r = nn.relu(r)
                r = nn.Conv(1, (1, 1), dtype=dtype, param_dtype=pdtype,
                            precision=prec,
                            kernel_init=nn.initializers.he_normal(),
                            name="refine_out")(r)
                out["refined"] = r.astype(jnp.float32)
        return out
