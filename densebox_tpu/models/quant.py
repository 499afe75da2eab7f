"""Int8 post-training-quantized inference path.

v5e's MXU runs int8 at ~2x bf16 peak (measured here: 206 TOP/s vs 138
TFLOP/s on DenseBox conv shapes — a 1.5x win); this module provides a
drop-in quantized DenseBox: symmetric per-output-channel int8 weights,
per-layer activation scales from absmax calibration, int8 convs with int32
accumulation, bf16 elementwise glue. Only convs are quantized; pooling,
upsample, concat and head outputs stay in bf16/f32.

Usage (API-compatible with the float model, so make_detect_fn works as-is):

    qparams = quantize_densebox(params, cfg, calib_images)
    qmodel = QuantDenseBox(cfg)
    detect = make_detect_fn(qmodel, infer_cfg, label_cfg)
    dets = detect(qparams, images)

This is an inference-only production path: training stays bf16/f32
(quantization-aware training is out of scope, as it is for the reference).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from densebox_tpu.config import ModelCfg
from densebox_tpu.models.densebox import (space_to_depth, trunk_plan,
                                          upsample2x_align_corners)

_GLUE = jnp.bfloat16  # dtype for everything between quantized convs


def _conv_names(cfg: ModelCfg):
    names = [n for k, n, _ in trunk_plan(cfg) if k == "conv"]
    for prefix in (["det", "loc"] +
                   (["lm"] if cfg.num_landmarks else [])):
        names += [f"{prefix}/{prefix}_conv1", f"{prefix}/{prefix}_conv2"]
    if cfg.num_landmarks and cfg.use_refine:
        names += ["refine_conv1", "refine_conv2", "refine_out"]
    return names


def _get(params, name):
    node = params["params"]
    for part in name.split("/"):
        node = node[part]
    return node


def _quant_weight(w: jnp.ndarray):
    """HWIO weight -> (int8 weight, per-output-channel scale)."""
    s = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0            # (Cout,)
    s = jnp.maximum(s, 1e-12)
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return wq, s.astype(jnp.float32)


def _quant_act(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -127, 127).astype(jnp.int8)


def _int8_conv(x_q, wq, *, pad: int, out_dtype=jnp.int32):
    """int8 conv; ``out_dtype`` picks the materialized accumulator type.
    Profiling (BASELINE.md round 2) suggested the requant fusions are
    bandwidth-bound on reading the int32 conv outputs; emitting bfloat16
    (~0.3% relative output error) was measured at only ~1% e2e gain on the
    turbo config, so int32 stays the default."""
    dn = lax.conv_dimension_numbers(x_q.shape, wq.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x_q, wq, (1, 1), padding=((pad, pad), (pad, pad)),
        dimension_numbers=dn, preferred_element_type=out_dtype)


def _forward(params, images, cfg: ModelCfg, *, taps=None, qparams=None,
             acc_dtype=jnp.int32, up_int8=False,
             head_fuse=False, tail_bf16=False) -> Dict[str, jnp.ndarray]:
    """One walk serves two masters: with ``taps`` (a dict) it runs the bf16
    reference forward recording each conv's input absmax (calibration);
    with ``qparams`` it runs the int8 path. Structure mirrors
    DenseBox.__call__ exactly (inference mode, no dropout).

    The skip-fusion ``feat`` tensor is quantized ONCE and shared by every
    head's conv1: all head conv1 input scales are calibrated from the same
    feat tensor, so they are equal by construction (asserted in
    quantize_densebox) and per-head re-quantization is a redundant
    full-feat clamp/convert pass (2-3x feat traffic in the round-2/3
    profiles' clamp_convert bucket).

    ``up_int8``: run the x2 skip upsample int8-in/int8-out — quantize f4 at
    its own calibrated scale at LOW resolution, interp-matmul the s8 codes
    in bf16 with the rescale-to-feat-scale + round/clamp fused into the
    epilogue. Quartered upsample HBM traffic for <=1-LSB extra quant noise
    (measured A/B + cert deltas in BASELINE.md round 3).

    ``tail_bf16``: run the MXU-starved tail convs — every head conv2
    (Cout in {1, 4, L}) and the refine branch (5-channel input, width 64)
    — in bf16 with weights dequantized from their int8 codes, instead of
    int8. Those convs are bandwidth-bound, not MXU-bound, so int8 gains
    nothing on the matmul while each one pays a full-size bf16->int8
    clamp_convert quantize pass on its input (the dominant non-conv
    bucket in the round-3 landmark-pipeline profile). bf16 reads the
    hidden tensor directly and skips the quantize entirely. Same int8
    weight codes either way; activations are simply not re-quantized
    (strictly less quantization noise)."""
    plan = trunk_plan(cfg)
    f3_tap = [n for k, n, _ in plan
              if k == "conv" and n.startswith("conv3")][-1]

    def conv(x, name, pad, relu=True, xq=None, tail=False):
        if qparams is not None:
            q = qparams[name]
            if tail and tail_bf16:
                # bandwidth-bound tail conv: bf16 activations straight in,
                # weights dequantized from their int8 codes (tiny, trace
                # time); no clamp_convert pass on the big hidden tensor
                wf = (q["w_q"].astype(jnp.float32)
                      * q["w_scale"]).astype(_GLUE)
                dn = lax.conv_dimension_numbers(
                    x.shape, wf.shape, ("NHWC", "HWIO", "NHWC"))
                y = lax.conv_general_dilated(
                    x.astype(_GLUE), wf, (1, 1),
                    padding=((pad, pad), (pad, pad)), dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                y = y + q["bias"]
                y = y.astype(_GLUE)
                return jax.nn.relu(y) if relu else y
            if xq is None:
                xq = _quant_act(x, q["in_scale"])
            y = _int8_conv(xq, q["w_q"], pad=pad,
                           out_dtype=acc_dtype).astype(jnp.float32)
            y = y * (q["in_scale"] * q["w_scale"]) + q["bias"]
        else:
            taps[name] = jnp.max(jnp.abs(x)).astype(jnp.float32)
            p = _get(params, name)
            dn = lax.conv_dimension_numbers(
                x.shape, p["kernel"].shape, ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(
                x.astype(_GLUE), p["kernel"].astype(_GLUE), (1, 1),
                padding=((pad, pad), (pad, pad)), dimension_numbers=dn)
            y = y + p["bias"].astype(_GLUE)
        y = y.astype(_GLUE)
        return jax.nn.relu(y) if relu else y

    x = images.astype(_GLUE)
    f3 = None
    for kind, name, _ in plan:
        if kind == "conv":
            x = conv(x, name, pad=1)
            if name == f3_tap:
                f3 = x
        elif kind == "s2d":
            x = space_to_depth(x, 2)
        elif kind == "s2d4":
            x = space_to_depth(x, 4)
        else:
            x = lax.reduce_window(x, -jnp.inf, lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    if taps is not None:
        # calibrate the pre-upsample skip tensor's own scale (up_int8 path)
        taps["__f4__"] = jnp.max(jnp.abs(x)).astype(jnp.float32)

    feat = featq = None
    if qparams is None:
        feat = jnp.concatenate([f3, upsample2x_align_corners(x)], axis=-1)
    else:
        s_feat = qparams["det/det_conv1"]["in_scale"]
        f4_scale = qparams.get("f4_scale") if up_int8 else None
        if f4_scale is not None:
            # int8-in/int8-out upsample: quantize f4 at LOW resolution with
            # its own calibrated scale, interp the codes in bf16, fold the
            # rescale-to-feat-scale + round/clamp into the matmul epilogue.
            f4q = _quant_act(x, f4_scale)
            up = upsample2x_align_corners(f4q.astype(_GLUE))
            upq = jnp.clip(
                jnp.round(up.astype(jnp.float32) * (f4_scale / s_feat)),
                -127, 127).astype(jnp.int8)
            featq = jnp.concatenate([_quant_act(f3, s_feat), upq], axis=-1)
        else:
            feat = jnp.concatenate([f3, upsample2x_align_corners(x)], -1)
            featq = _quant_act(feat, s_feat)

    prefixes = ["det", "loc"] + (["lm"] if cfg.num_landmarks else [])
    hidden = {}
    if qparams is not None and head_fuse:
        # every head's conv1 is a 1x1 conv over the SAME int8 feat tensor
        # (~1 GB/call at turbo shapes): concatenating the weights along
        # Cout runs ONE conv that reads feat once instead of len(heads)
        # times, and merges the dequant+ReLU epilogues. Per-output-channel
        # w_scale/bias concat keeps the math bit-identical per channel.
        qs = [qparams[f"{p}/{p}_conv1"] for p in prefixes]
        wcat = jnp.concatenate([q["w_q"] for q in qs], axis=-1)
        scat = jnp.concatenate([q["in_scale"] * q["w_scale"] for q in qs])
        bcat = jnp.concatenate([q["bias"] for q in qs])
        y = _int8_conv(featq, wcat, pad=0,
                       out_dtype=acc_dtype).astype(jnp.float32)
        y = jax.nn.relu((y * scat + bcat).astype(_GLUE))
        splits = []
        for q in qs[:-1]:
            splits.append((splits[-1] if splits else 0)
                          + q["w_q"].shape[-1])
        for p, h in zip(prefixes, jnp.split(y, splits, axis=-1)):
            hidden[p] = h

    def head(prefix):
        h = hidden.get(prefix)
        if h is None:
            h = conv(feat, f"{prefix}/{prefix}_conv1", pad=0, xq=featq)
        return conv(h, f"{prefix}/{prefix}_conv2", pad=0, relu=False,
                    tail=True)

    out = {"score": head("det").astype(jnp.float32),
           "loc": head("loc").astype(jnp.float32)}
    if cfg.num_landmarks:
        lm = head("lm")
        out["lm"] = lm.astype(jnp.float32)
        if cfg.use_refine:
            r = jnp.concatenate([out["score"].astype(_GLUE), lm], -1)
            r = conv(r, "refine_conv1", pad=1, tail=True)
            r = conv(r, "refine_conv2", pad=1, tail=True)
            out["refined"] = conv(r, "refine_out", pad=0,
                                  relu=False, tail=True).astype(jnp.float32)
    return out


def _forward_fused(qparams, images, cfg: ModelCfg,
                   conv_backend: str = "pallas") -> Dict[str, jnp.ndarray]:
    """Int8 forward with int8 activations in HBM between convs; the
    int32/bf16 intermediates of the XLA path never exist. Numerically it is
    the same quantization chain as ``_forward(qparams=...)`` — each layer
    dequantizes with in_scale*w_scale, adds bias, ReLUs, and requantizes by
    the NEXT layer's calibrated input scale — so outputs agree with the XLA
    int8 path up to f32-associativity in the epilogue.

    conv_backend:
      'pallas' — fused Pallas conv+requant kernel (ops/pallas/qconv.py;
                 measured slower than XLA convs, kept as a tested backend)
      'hybrid' — XLA int8 convs (the measured winner) + requant-ONLY
                 Pallas epilogue (ops/pallas/requant.py): one int32->int8
                 pass per layer instead of the XLA chain's dequant-to-bf16
                 + next-layer-quantize fusions (the ~25% clamp_convert
                 bucket in the round-2 profile)."""
    from densebox_tpu.ops.pallas.qconv import qconv_int8
    from densebox_tpu.ops.pallas.requant import requant_epilogue

    plan = trunk_plan(cfg)
    convs = [n for k, n, _ in plan if k == "conv"]
    f3_tap = [n for n in convs if n.startswith("conv3")][-1]
    q = qparams

    def in_scale(name):
        return q[name]["in_scale"]

    def fused(x_q, name, nxt, *, relu=True):
        """x_q int8 at in_scale(name) -> int8 at in_scale(nxt) (or f32)."""
        out_scale = (1.0 / in_scale(nxt)) if nxt is not None else None
        scale = in_scale(name) * q[name]["w_scale"]
        if conv_backend == "hybrid":
            acc = _int8_conv(x_q, q[name]["w_q"],
                             pad=q[name]["w_q"].shape[0] // 2)
            return requant_epilogue(acc, scale, q[name]["bias"], out_scale,
                                    relu=relu)
        return qconv_int8(x_q, q[name]["w_q"], scale,
                          q[name]["bias"], out_scale, relu=relu)

    # trunk: quantize the input image once, then stay int8 end to end
    x_q = _quant_act(images.astype(jnp.float32), in_scale(convs[0]))
    f3_q = None
    nxt = {convs[i]: convs[i + 1] for i in range(len(convs) - 1)}
    for kind, name, _ in plan:
        if kind == "conv":
            is_last = name == convs[-1]
            x_q = fused(x_q, name, None if is_last else nxt[name])
            if name == f3_tap:
                f3_q = x_q          # int8 at in_scale(conv4_1)
        elif kind == "s2d":
            x_q = space_to_depth(x_q, 2)
        elif kind == "s2d4":
            x_q = space_to_depth(x_q, 4)
        else:
            # max-pool commutes with the monotonic requant: pooling the int8
            # codes equals pooling in float then quantizing
            x_q = lax.reduce_window(x_q, jnp.int8(-128), lax.max,
                                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    f4 = x_q.astype(_GLUE)          # conv4_d emitted f32 (no next scale)

    f3 = (f3_q.astype(jnp.float32) * in_scale(nxt[f3_tap])).astype(_GLUE)
    feat = jnp.concatenate([f3, upsample2x_align_corners(f4)], axis=-1)

    def head(prefix):
        c1, c2 = f"{prefix}/{prefix}_conv1", f"{prefix}/{prefix}_conv2"
        h_q = _quant_act(feat, in_scale(c1))
        h_q = fused(h_q, c1, c2)
        return fused(h_q, c2, None, relu=False)

    out = {"score": head("det").astype(jnp.float32),
           "loc": head("loc").astype(jnp.float32)}
    if cfg.num_landmarks:
        lm = head("lm")
        out["lm"] = lm.astype(jnp.float32)
        if cfg.use_refine:
            r = jnp.concatenate([out["score"].astype(_GLUE),
                                 lm.astype(_GLUE)], -1)
            r_q = _quant_act(r, in_scale("refine_conv1"))
            r_q = fused(r_q, "refine_conv1", "refine_conv2")
            r_q = fused(r_q, "refine_conv2", "refine_out")
            out["refined"] = fused(r_q, "refine_out", None,
                                   relu=False).astype(jnp.float32)
    return out


def quantize_densebox(params, cfg: ModelCfg, calib_images: jnp.ndarray):
    """Calibrate activation scales on a representative batch and quantize
    all conv weights. Returns the qparams pytree for QuantDenseBox."""
    taps: Dict[str, jnp.ndarray] = {}
    _forward(params, calib_images, cfg, taps=taps)
    qparams = {}
    for name in _conv_names(cfg):
        p = _get(params, name)
        wq, ws = _quant_weight(jnp.asarray(p["kernel"], jnp.float32))
        qparams[name] = {
            "w_q": wq,
            "w_scale": ws,
            "in_scale": jnp.maximum(taps[name] / 127.0, 1e-12),
            "bias": jnp.asarray(p["bias"], jnp.float32),
        }
    # pre-upsample skip scale for the int8-upsample path (_forward up_int8)
    qparams["f4_scale"] = jnp.maximum(taps["__f4__"] / 127.0, 1e-12)
    # the shared-feat quantize in _forward uses det_conv1's scale for every
    # head; all head conv1 taps read the same feat tensor, so they must be
    # equal — guard the invariant at calibration time (eager, cheap)
    head_taps = [float(taps[f"{p}/{p}_conv1"]) for p in ("det", "loc", "lm")
                 if f"{p}/{p}_conv1" in taps]
    if any(t != head_taps[0] for t in head_taps[1:]):
        # a real exception, not an assert: this invariant is load-bearing
        # for the +4% shared-feat-quantize keep and must survive python -O
        raise ValueError(
            "calibration invariant violated: head conv1 input scales differ "
            f"({head_taps}) — the shared-feat quantize would be wrong")
    return qparams


class QuantDenseBox:
    """apply()-compatible int8 inference model (drop-in for DenseBox in
    make_detect_fn / detect_batch).

    backend: 'xla' (lax int8 convs + fused elementwise requant), 'pallas'
    (fused conv+requant kernel, ops/pallas/qconv.py — activations stay int8
    in HBM), 'hybrid' (XLA int8 convs + requant-only Pallas epilogue,
    ops/pallas/requant.py), or 'auto' (measured policy; see BASELINE.md
    ladders)."""

    def __init__(self, cfg: ModelCfg, backend: str = "auto",
                 acc_dtype: str = "auto", up_int8: str = "auto",
                 head_fuse: str = "auto", tail: str = "auto"):
        self.cfg = cfg
        self.backend = backend
        self.acc_dtype = acc_dtype
        self.up_int8 = up_int8
        self.head_fuse = head_fuse
        self.tail = tail

    def apply(self, qparams, images, train: bool = False, rngs=None):
        assert not train, "int8 path is inference-only"
        backend = self.backend
        if backend == "auto":
            # measured policy (BASELINE.md round-2): keep the XLA path as
            # the default until the fused kernel beats it on the ladder
            backend = "xla"
        acc = self.acc_dtype
        if acc == "auto":
            # Measured (round 2, turbo @B256): bfloat16 conv outputs gain
            # only ~1% e2e (6,045 vs 6,028 img/s — within noise), so the
            # exact int32 accumulator stays the default. The knob remains
            # for bandwidth-starved configs.
            acc = "int32"
        if backend in ("pallas", "hybrid"):
            return _forward_fused(qparams, images, self.cfg,
                                  conv_backend=backend)
        up = self.up_int8
        if up == "auto":
            # measured policy (round-3 A/B, turbo @B256): int8-in/int8-out
            # upsample = 5,525 img/s vs 6,252 with the bf16 upsample —
            # the extra round/clamp pass breaks XLA's upsample fusion and
            # costs more than the HBM traffic it saves. REJECTED; kept as
            # a tested backend (up_int8='on'). BASELINE.md round 3.
            up = False
        elif up in ("on", "off"):
            up = up == "on"
        tail = self.tail
        if tail == "auto":
            # measured policy (round-3 A/B, turbo @B256): bf16 tail convs
            # are slower on BOTH configs (det-only 6,107 vs 6,210; lm4
            # 3,708 vs 3,843) — XLA already folds the tail-conv input
            # quantizes into producer epilogues, so bf16 just doubles the
            # hidden-tensor read bytes. REJECTED; kept as a tested
            # backend (tail='bf16'). BASELINE.md round 3.
            tail = "int8"
        hf = self.head_fuse
        if hf == "auto":
            # measured policy (round-3 A/B, turbo @B256): fusing every
            # head conv1 into one concatenated int8 conv = 5,195 img/s vs
            # 6,090 split — the jnp.split of the fused output costs more
            # in relayout copies than the shared-feat re-read it saves
            # (XLA overlaps the per-head reads anyway). REJECTED; kept as
            # a tested backend (head_fuse='on'). BASELINE.md round 3.
            hf = False
        elif hf in ("on", "off"):
            hf = hf == "on"
        return _forward(None, images, self.cfg, qparams=qparams,
                        acc_dtype=jnp.dtype(acc), up_int8=bool(up),
                        head_fuse=bool(hf), tail_bf16=tail == "bf16")
