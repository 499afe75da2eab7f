"""Selected-scale landmark decode + Pallas window-gather kernel tests
(round-3: the landmark-pipeline hot path, BASELINE.md "Landmark-pipeline
throughput"; SURVEY.md §3.2 native-kernel obligations)."""

import jax
import jax.numpy as jnp
import numpy as np

from densebox_tpu.infer.detector import (decode_landmarks,
                                         decode_landmarks_selected)
from densebox_tpu.ops.window import gather_windows_jax
from densebox_tpu.ops.pallas.window import gather_windows_pallas

STRIDE = 4


def _random_case(seed, b=2, d=6, s=3, num_lm=4, win=16):
    rng = np.random.RandomState(seed)
    shapes = [(24 + 4 * i, 20 + 6 * i) for i in range(s)]      # all >= win
    scales = [(0.6 + 0.4 * i, 0.5 + 0.5 * i) for i in range(s)]
    lm_maps = [
        (jnp.asarray(rng.rand(b, h, w, num_lm).astype(np.float32)),
         (sx, sy))
        for (h, w), (sx, sy) in zip(shapes, scales)]
    # boxes in original-image coords, sized so windows mostly fit
    cx = rng.uniform(20, 80, (b, d))
    cy = rng.uniform(20, 80, (b, d))
    half = rng.uniform(4, 20, (b, d))
    boxes = jnp.asarray(
        np.stack([cx - half, cy - half, cx + half, cy + half], -1),
        jnp.float32)
    valid = jnp.asarray(rng.rand(b, d) > 0.2)
    sel = jnp.asarray(rng.randint(0, s, (b, d)), jnp.int32)
    return lm_maps, boxes, valid, sel


def _legacy_masked_sum(lm_maps, sel, boxes, valid, *, anchors, win):
    """The round-2 decode: per-scale decode_landmarks, masked-summed."""
    num_lm = lm_maps[0][0].shape[-1]
    pts = jnp.zeros(boxes.shape[:2] + (num_lm, 2), jnp.float32)
    for s_idx, (lm, (sx, sy)) in enumerate(lm_maps):
        def one(lm_, bx, vl, sx=sx, sy=sy):
            return decode_landmarks(lm_, bx, vl, stride=STRIDE,
                                    scale_x=sx, scale_y=sy, window=win,
                                    anchors=anchors)

        pts = pts + jax.vmap(one)(lm, boxes, valid & (sel == s_idx))
    return pts


def test_gather_windows_pallas_matches_jax():
    rng = np.random.RandomState(0)
    b, s, num_lm, hm, wm, d, win = 2, 3, 4, 40, 36, 7, 16
    maps = jnp.asarray(rng.rand(b, s, num_lm, hm, wm).astype(np.float32))
    sel = jnp.asarray(rng.randint(0, s, (b, d)), jnp.int32)
    y0 = jnp.asarray(rng.randint(0, hm - win, (b, d, num_lm)), jnp.int32)
    x0 = jnp.asarray(rng.randint(0, wm - win, (b, d, num_lm)), jnp.int32)
    out_p = gather_windows_pallas(maps, sel, y0, x0, win)
    out_j = gather_windows_jax(maps, sel, y0, x0, win)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_j))


def test_selected_decode_matches_legacy_anchored():
    anchors = jnp.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], jnp.float32)
    for seed in (0, 1, 2):
        lm_maps, boxes, valid, sel = _random_case(seed)
        want = _legacy_masked_sum(lm_maps, sel, boxes, valid,
                                  anchors=anchors, win=16)
        for backend in ("jax", "pallas"):
            got, ok = decode_landmarks_selected(
                lm_maps, sel, boxes, valid, stride=STRIDE, window=16,
                anchors=anchors, backend=backend)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-4)
            assert np.asarray(ok).shape == got.shape[:-1]
            # lm_valid is False wherever the detection itself is invalid
            assert not np.asarray(ok)[~np.asarray(valid)].any()


def test_selected_decode_matches_legacy_anchorless():
    lm_maps, boxes, valid, sel = _random_case(3)
    want = _legacy_masked_sum(lm_maps, sel, boxes, valid,
                              anchors=None, win=16)
    got, _ = decode_landmarks_selected(
        lm_maps, sel, boxes, valid, stride=STRIDE, window=16,
        anchors=None, backend="jax")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_lm_valid_flags_center_fallback():
    """Degenerate boxes (no strict-interior window pixel) and anchor-less
    boxes larger than the window must report lm_valid=False and the box
    center — callers can now distinguish a real decode from the fallback
    (round-2 advisor finding)."""
    rng = np.random.RandomState(7)
    b, num_lm = 1, 2
    lm_maps = [(jnp.asarray(rng.rand(b, 40, 40, num_lm).astype(np.float32)),
                (1.0, 1.0))]
    # box 0: tiny degenerate box between pixel centers; box 1: huge box
    # spanning far beyond the window (anchor-less span check)
    boxes = jnp.asarray([[[41.0, 41.0, 42.9, 42.9],
                          [2.0, 2.0, 158.0, 158.0]]], jnp.float32)
    valid = jnp.ones((1, 2), bool)
    sel = jnp.zeros((1, 2), jnp.int32)
    pts, ok = decode_landmarks_selected(
        lm_maps, sel, boxes, valid, stride=STRIDE, window=8,
        anchors=None, backend="jax")
    okn = np.asarray(ok)
    assert not okn[0, 1].any()          # oversized box -> fallback flagged
    ptsn = np.asarray(pts)
    np.testing.assert_allclose(ptsn[0, 1, :, 0], 80.0, atol=1e-4)
    np.testing.assert_allclose(ptsn[0, 1, :, 1], 80.0, atol=1e-4)


def test_detect_batch_backends_agree_with_landmarks():
    """End-to-end detect with landmarks: pallas and jax window backends
    produce identical results, and lm_valid is exposed."""
    import dataclasses

    from densebox_tpu.config import InferCfg, LabelCfg, ModelCfg
    from densebox_tpu.infer.detector import detect_batch
    from densebox_tpu.models import DenseBox

    cfg = ModelCfg(width_mult=0.125, num_landmarks=4, use_refine=True)
    model = DenseBox(cfg)
    img = jax.random.uniform(jax.random.key(0), (2, 64, 80, 3))
    params = model.init(jax.random.key(1), img)
    label = LabelCfg(patch_size=64, std_height_px=20.0,
                     lm_anchors=((0, 0), (1, 0), (1, 1), (0, 1)))
    base = InferCfg(scales=(0.5, 1.0), score_thresh=-1e9,
                    topk_per_scale=16, max_dets=8, nms_backend="jax")
    outs = {}
    for backend in ("jax", "pallas"):
        icfg = dataclasses.replace(base, lm_backend=backend)
        outs[backend] = detect_batch(model, params, img, icfg, label)
    assert "lm_points" in outs["jax"] and "lm_valid" in outs["jax"]
    np.testing.assert_allclose(np.asarray(outs["jax"]["lm_points"]),
                               np.asarray(outs["pallas"]["lm_points"]),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(outs["jax"]["lm_valid"]),
                                  np.asarray(outs["pallas"]["lm_valid"]))


def test_lm_topk_truncation_matches_full_decode():
    """lm_topk decodes the top-K score-sorted slots exactly and zeroes the
    rest (InferCfg.lm_topk truncation contract)."""
    import dataclasses

    from densebox_tpu.config import InferCfg, LabelCfg, ModelCfg
    from densebox_tpu.infer.detector import detect_batch
    from densebox_tpu.models import DenseBox

    cfg = ModelCfg(width_mult=0.125, num_landmarks=4, use_refine=True)
    model = DenseBox(cfg)
    img = jax.random.uniform(jax.random.key(0), (2, 64, 80, 3))
    params = model.init(jax.random.key(1), img)
    label = LabelCfg(patch_size=64, std_height_px=20.0)
    base = InferCfg(scales=(1.0,), score_thresh=-1e9, topk_per_scale=16,
                    max_dets=8, nms_backend="jax", lm_backend="jax")
    full = detect_batch(model, params, img,
                        dataclasses.replace(base, lm_topk=0), label)
    trunc = detect_batch(model, params, img,
                         dataclasses.replace(base, lm_topk=4), label)
    np.testing.assert_allclose(np.asarray(trunc["lm_points"])[:, :4],
                               np.asarray(full["lm_points"])[:, :4],
                               atol=1e-5)
    assert not np.asarray(trunc["lm_points"])[:, 4:].any()
    assert not np.asarray(trunc["lm_valid"])[:, 4:].any()
    np.testing.assert_array_equal(np.asarray(trunc["lm_valid"])[:, :4],
                                  np.asarray(full["lm_valid"])[:, :4])


def test_gather_windows_bf16_exact():
    """The one-hot extraction is a bit-exact copy in any dtype: bf16 maps
    through the Pallas kernel must equal the jax twin's slices bitwise."""
    rng = np.random.RandomState(5)
    b, s, num_lm, hm, wm, d, win = 2, 3, 4, 40, 36, 7, 16
    maps = jnp.asarray(rng.rand(b, s, num_lm, hm, wm).astype(np.float32),
                       jnp.bfloat16)
    sel = jnp.asarray(rng.randint(0, s, (b, d)), jnp.int32)
    y0 = jnp.asarray(rng.randint(0, hm - win, (b, d, num_lm)), jnp.int32)
    x0 = jnp.asarray(rng.randint(0, wm - win, (b, d, num_lm)), jnp.int32)
    out_p = gather_windows_pallas(maps, sel, y0, x0, win)
    out_j = gather_windows_jax(maps, sel, y0, x0, win)
    assert out_p.dtype == jnp.bfloat16 and out_j.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out_p, np.float32), np.asarray(out_j, np.float32))


def test_selected_decode_bf16_close_to_f32():
    """lm_dtype='bfloat16' decode: same windows, bf16 heat values — decoded
    points must match the f32 path within a fraction of a map pixel (the
    argmax is invariant unless two peaks differ by <1 bf16 ulp; the
    parabola shift is bounded by +-0.5 px and degrades gracefully)."""
    anchors = jnp.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], jnp.float32)
    for seed in (0, 1):
        lm_maps, boxes, valid, sel = _random_case(seed)
        # real heatmaps have contrast: zero background with one clear peak
        # at each detection's ANCHOR position on its selected scale (so the
        # peak is inside the anchored search disc) — bf16 cannot perturb an
        # argmax whose margin is O(1), only true near-ties (uniform noise
        # is all near-ties and decodes garbage either way)
        bxs = np.asarray(boxes)
        sels = np.asarray(sel)
        arrs = [np.zeros_like(np.asarray(m)) for m, _ in lm_maps]
        for bi in range(bxs.shape[0]):
            for di in range(bxs.shape[1]):
                si = int(sels[bi, di])
                a, (sx, sy) = arrs[si], lm_maps[si][1]
                x1, y1, x2, y2 = bxs[bi, di]
                for li, (ax, ay) in enumerate(np.asarray(anchors)):
                    px = int(np.floor((x1 + ax * (x2 - x1)) * sx / STRIDE))
                    py = int(np.floor((y1 + ay * (y2 - y1)) * sy / STRIDE))
                    px = np.clip(px, 1, a.shape[2] - 2)
                    py = np.clip(py, 1, a.shape[1] - 2)
                    a[bi, py, px, li] = 2.0
                    a[bi, py, px - 1, li] = a[bi, py, px + 1, li] = 1.2
                    a[bi, py - 1, px, li] = a[bi, py + 1, px, li] = 1.2
        planted = [(jnp.asarray(a), sc) for a, (_, sc) in
                   zip(arrs, lm_maps)]
        f32, ok32 = decode_landmarks_selected(
            planted, sel, boxes, valid, stride=STRIDE, anchors=anchors,
            window=16, backend="jax")
        bf = [(m.astype(jnp.bfloat16), sc) for m, sc in planted]
        b16, ok16 = decode_landmarks_selected(
            bf, sel, boxes, valid, stride=STRIDE, anchors=anchors,
            window=16, backend="jax")
        # identical argmax pixels; sub-pixel parabola may shift by the bf16
        # quantization of the neighbor values (<0.1 map px ~ <1 image px)
        dist = np.linalg.norm(np.asarray(f32 - b16), axis=-1)
        assert float(dist.max()) < 1.0, (seed, dist.max())
        np.testing.assert_array_equal(np.asarray(ok32), np.asarray(ok16))


def test_oversized_window_raises():
    """Windows larger than the strip minus origin-alignment slack must fail
    loudly — the one-hot pickers would silently return zero-filled rows
    (round-3 advice)."""
    import pytest

    maps = jnp.zeros((1, 1, 2, 64, 64), jnp.float32)
    sel = jnp.zeros((1, 2), jnp.int32)
    y0 = jnp.zeros((1, 2, 2), jnp.int32)
    with pytest.raises(ValueError, match="strip geometry"):
        gather_windows_pallas(maps, sel, y0, y0, win=36)


def test_gather_windows_dp_override_exact():
    """The dp (in-flight-DMA depth) override is a pure scheduling knob —
    outputs identical to the jax twin at dp 16 and 4, and a non-dividing
    dp fails loudly."""
    import pytest

    rng = np.random.RandomState(3)
    b, s, num_lm, hm, wm, d, win = 2, 2, 3, 48, 40, 32, 16
    maps = jnp.asarray(rng.rand(b, s, num_lm, hm, wm).astype(np.float32))
    sel = jnp.asarray(rng.randint(0, s, (b, d)), jnp.int32)
    y0 = jnp.asarray(rng.randint(0, hm - win, (b, d, num_lm)), jnp.int32)
    x0 = jnp.asarray(rng.randint(0, wm - win, (b, d, num_lm)), jnp.int32)
    ref = gather_windows_jax(maps, sel, y0, x0, win)
    for dp in (16, 4):
        out = gather_windows_pallas(maps, sel, y0, x0, win, dp=dp)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    with pytest.raises(ValueError, match="must divide"):
        gather_windows_pallas(maps, sel, y0, x0, win, dp=5)
