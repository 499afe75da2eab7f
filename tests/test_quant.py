"""Int8 quantized inference path: close to the float model, and detection
quality survives quantization on a trained model."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from densebox_tpu.config import (DenseBoxConfig, InferCfg, LabelCfg, ModelCfg,
                                 TrainCfg)
from densebox_tpu.data import synthetic_batch
from densebox_tpu.eval import detections_to_numpy, evaluate_detections
from densebox_tpu.infer import make_detect_fn
from densebox_tpu.models import DenseBox
from densebox_tpu.models.quant import QuantDenseBox, quantize_densebox


def test_int8_upsample_tracks_bf16_upsample():
    """up_int8 (quantize-f4-then-interp, round-3 bandwidth lever) stays
    within ~1 LSB of the bf16-upsample int8 path: the only new error is f4
    pre-quantization noise carried through the convex interp + the double
    rounding, both bounded by the feat quantization step."""
    cfg = ModelCfg(num_landmarks=3, use_refine=True, width_mult=0.125)
    model = DenseBox(cfg)
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    params = model.init(jax.random.key(1), x)
    qparams = quantize_densebox(params, cfg, x)
    assert "f4_scale" in qparams

    off = QuantDenseBox(cfg, up_int8="off").apply(qparams, x)
    on = QuantDenseBox(cfg, up_int8="on").apply(qparams, x)
    assert set(on) == set(off)
    for k in off:
        a, b = np.asarray(off[k]), np.asarray(on[k])
        scale = np.abs(a).max() + 1e-6
        rel = np.abs(a - b).max() / scale
        assert rel < 0.05, f"head {k}: up_int8 deviates {rel:.3f}"
    # legacy qparams without the calibration entry fall back cleanly
    legacy = {k: v for k, v in qparams.items() if k != "f4_scale"}
    out = QuantDenseBox(cfg).apply(legacy, x)
    for k in off:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(off[k]),
                                   atol=1e-5)


@pytest.mark.slow
def test_quant_outputs_track_float():
    cfg = ModelCfg(num_landmarks=3, use_refine=True, width_mult=0.125)
    model = DenseBox(cfg)
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    params = model.init(jax.random.key(1), x)
    want = model.apply(params, x)

    qparams = quantize_densebox(params, cfg, x)
    got = jax.jit(lambda q, x: QuantDenseBox(cfg).apply(q, x))(qparams, x)

    assert set(got) == set(want)
    for k in want:
        a, b = np.asarray(want[k]), np.asarray(got[k])
        scale = np.abs(a).max() + 1e-6
        rel = np.abs(a - b).max() / scale
        assert rel < 0.15, f"head {k}: int8 deviates {rel:.3f} from float"


@pytest.mark.slow
def test_quant_detection_quality_survives():
    """Train briefly on synthetic data; int8 AP ~ float AP."""
    from densebox_tpu.train import fit

    cfg = DenseBoxConfig(
        model=ModelCfg(width_mult=0.125),
        label=LabelCfg(patch_size=64, std_height_px=20.0),
        train=TrainCfg(batch_size=8, learning_rate=3e-3, max_boxes=2))
    canvas_cfg = LabelCfg(patch_size=128, std_height_px=20.0)

    def fetch(step):
        return synthetic_batch(jax.random.key(step), 8, canvas_cfg,
                               max_boxes=2)

    result = fit(cfg, fetch, num_steps=200)
    params = result.state.params
    model = DenseBox(cfg.model)
    icfg = InferCfg(scales=(1.0,), score_thresh=0.4, topk_per_scale=64,
                    max_dets=8)

    calib = synthetic_batch(jax.random.key(777), 4, canvas_cfg,
                            max_boxes=2)["image"]
    qparams = quantize_densebox(params, cfg.model, calib)

    def ap_of(m, p):
        detect = make_detect_fn(m, icfg, cfg.label)
        per_image = []
        for i in range(3):
            b = synthetic_batch(jax.random.key(20_000 + i), 4, canvas_cfg,
                                max_boxes=2)
            per_image += detections_to_numpy(
                detect(p, b["image"]), b["boxes"], b["box_valid"])
        return evaluate_detections(per_image)["ap"]

    ap_f = ap_of(model, params)
    ap_q = ap_of(QuantDenseBox(cfg.model), qparams)
    assert ap_f > 0.5
    assert ap_q > 0.85 * ap_f, (ap_f, ap_q)


def test_fused_pallas_backend_tracks_xla_backend():
    """QuantDenseBox(backend='pallas') stays close to the XLA int8 path:
    the only deliberate deviations are the f32 (vs bf16) epilogue and the
    f3 skip branch passing through int8 once more (quant.py docstring)."""
    import jax

    from densebox_tpu.config import ModelCfg
    from densebox_tpu.models import DenseBox
    from densebox_tpu.models.quant import QuantDenseBox, quantize_densebox

    cfg = ModelCfg(stem="s2d4", trunk_depth=2, width_mult=0.125,
                   num_landmarks=3, use_refine=True,
                   compute_dtype="bfloat16")
    m = DenseBox(cfg)
    x = jax.random.uniform(jax.random.key(0), (2, 32, 40, 3))
    p = m.init(jax.random.key(1), x)
    qp = quantize_densebox(p, cfg, x)
    a = QuantDenseBox(cfg, backend="xla").apply(qp, x)
    b = QuantDenseBox(cfg, backend="pallas").apply(qp, x)
    assert set(a) == set(b)
    for k in a:
        d = float(jnp.abs(a[k].astype(jnp.float32)
                          - b[k].astype(jnp.float32)).max())
        s = float(jnp.abs(a[k]).max()) + 1e-6
        assert d / s < 0.15, (k, d, s)


def test_hybrid_backend_matches_pallas_fused_chain():
    """backend='hybrid' (XLA int8 convs + requant-only Pallas epilogue)
    computes the SAME quantization chain as the fused Pallas path — same
    int32 accumulation, same f32 epilogue, same round/clip — so outputs
    must agree to accumulation-order noise (round-3 requant lever,
    BASELINE.md)."""
    import jax

    from densebox_tpu.config import ModelCfg
    from densebox_tpu.models import DenseBox
    from densebox_tpu.models.quant import QuantDenseBox, quantize_densebox

    cfg = ModelCfg(stem="s2d4", trunk_depth=2, width_mult=0.125,
                   num_landmarks=3, use_refine=True,
                   compute_dtype="bfloat16")
    m = DenseBox(cfg)
    x = jax.random.uniform(jax.random.key(0), (2, 32, 40, 3))
    p = m.init(jax.random.key(1), x)
    qp = quantize_densebox(p, cfg, x)
    a = QuantDenseBox(cfg, backend="pallas").apply(qp, x)
    b = QuantDenseBox(cfg, backend="hybrid").apply(qp, x)
    assert set(a) == set(b)
    for k in a:
        d = float(jnp.abs(a[k].astype(jnp.float32)
                          - b[k].astype(jnp.float32)).max())
        s = float(jnp.abs(a[k]).max()) + 1e-6
        assert d / s < 0.02, (k, d, s)


def test_bf16_tail_close_to_int8_tail():
    """tail='bf16' runs the head conv2s + refine branch in bf16 with
    weights dequantized from the SAME int8 codes; outputs differ from the
    all-int8 path only by the skipped activation quantization (strictly
    less noise), so they must agree to a few percent of each output's
    scale."""
    cfg = ModelCfg(num_landmarks=3, use_refine=True, width_mult=0.125)
    model = DenseBox(cfg)
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    params = model.init(jax.random.key(1), x)
    qparams = quantize_densebox(params, cfg, x)

    a = QuantDenseBox(cfg, tail="int8").apply(qparams, x)
    b = QuantDenseBox(cfg, tail="bf16").apply(qparams, x)
    assert set(a) == set(b)
    for k in a:
        d = float(jnp.abs(a[k].astype(jnp.float32)
                          - b[k].astype(jnp.float32)).max())
        s = float(jnp.abs(a[k]).max()) + 1e-6
        assert d / s < 0.05, (k, d, s)


def test_fused_head_conv1_matches_split():
    """head_fuse concatenates every head conv1 into one int8 conv over the
    shared feat; int32 accumulation is exact and the per-channel dequant
    is unchanged, so outputs must match the split path bitwise."""
    cfg = ModelCfg(num_landmarks=3, use_refine=True, width_mult=0.125)
    model = DenseBox(cfg)
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    params = model.init(jax.random.key(1), x)
    qparams = quantize_densebox(params, cfg, x)

    split = QuantDenseBox(cfg, head_fuse="off").apply(qparams, x)
    fused = QuantDenseBox(cfg, head_fuse="on").apply(qparams, x)
    assert set(split) == set(fused)
    for k in split:
        np.testing.assert_allclose(np.asarray(fused[k]),
                                   np.asarray(split[k]),
                                   rtol=0, atol=1e-5, err_msg=k)
