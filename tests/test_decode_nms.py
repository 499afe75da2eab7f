"""Decode + NMS unit tests (SURVEY.md §5.2) and config-1/2/3 integration
slices (BASELINE.json configs: single-scale CPU inference, pyramid +
cross-scale NMS, landmark branch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from densebox_tpu.config import InferCfg, LabelCfg, ModelCfg
from densebox_tpu.infer import decode_landmarks, detect_batch, make_detect_fn
from densebox_tpu.models import DenseBox
from densebox_tpu.ops import decode_topk, iou_matrix, nms


def _numpy_nms(boxes, scores, iou_thresh):
    """Plain greedy reference NMS."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * \
            (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(area_i + area_r - inter, 1e-9)
        order = rest[iou <= iou_thresh]
    return keep


def test_iou_matrix_basic():
    a = jnp.array([[0., 0., 10., 10.], [5., 5., 15., 15.]])
    m = np.asarray(iou_matrix(a, a))
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-6)
    np.testing.assert_allclose(m[0, 1], 25.0 / 175.0, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_matches_numpy_reference(seed):
    rng = np.random.RandomState(seed)
    n = 64
    ctr = rng.uniform(20, 200, (n, 2))
    wh = rng.uniform(10, 60, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)

    ref_keep = _numpy_nms(boxes, scores, 0.5)
    ob, osc, ov = jax.jit(
        lambda b, s, v: nms(b, s, v, iou_thresh=0.5, max_out=n)
    )(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool))
    got = np.asarray(osc)[np.asarray(ov)]
    want = np.sort(scores[ref_keep])[::-1]
    np.testing.assert_allclose(got, want, atol=1e-6)
    # surviving boxes match too (scores are unique w.h.p.)
    got_boxes = np.asarray(ob)[np.asarray(ov)]
    want_boxes = boxes[ref_keep][np.argsort(-scores[ref_keep])]
    np.testing.assert_allclose(got_boxes, want_boxes, atol=1e-5)


def test_nms_respects_validity():
    boxes = jnp.array([[0., 0., 10., 10.], [100., 100., 110., 110.]])
    scores = jnp.array([0.9, 0.8])
    valid = jnp.array([False, True])
    _, sc, vl = nms(boxes, scores, valid, iou_thresh=0.5, max_out=2)
    assert np.asarray(vl).sum() == 1
    assert np.asarray(sc)[0] == pytest.approx(0.8)


def test_decode_roundtrips_known_box():
    """Encode a box into score/loc maps at one pixel; decode must return it."""
    lab = LabelCfg()
    h = w = 32
    box = np.array([20.0, 24.0, 80.0, 72.0])  # xyxy, image coords (scale 1)
    py, px = 12, 14  # map pixel inside the box
    score = np.zeros((h, w), np.float32)
    score[py, px] = 1.0
    loc = np.zeros((h, w, 4), np.float32)
    # distances in map units, normalized (paper §3.3 / decode docstring)
    loc[py, px] = [(px - box[0] / lab.stride) / lab.loc_norm,
                   (py - box[1] / lab.stride) / lab.loc_norm,
                   (box[2] / lab.stride - px) / lab.loc_norm,
                   (box[3] / lab.stride - py) / lab.loc_norm]
    boxes, scores, valid = decode_topk(
        jnp.asarray(score), jnp.asarray(loc), stride=lab.stride,
        loc_norm=lab.loc_norm, topk=8, score_thresh=0.5)
    assert bool(valid[0]) and not bool(valid[1])
    np.testing.assert_allclose(np.asarray(boxes[0]), box, atol=1e-4)


def test_decode_scale_mapping():
    """With scale factors != 1, decoded coords map back to original image."""
    lab = LabelCfg()
    score = np.zeros((16, 16), np.float32)
    score[8, 8] = 1.0
    loc = np.zeros((16, 16, 4), np.float32)
    loc[8, 8] = [0.2, 0.2, 0.2, 0.2]
    boxes, _, _ = decode_topk(
        jnp.asarray(score), jnp.asarray(loc), stride=4, loc_norm=12.5,
        topk=4, score_thresh=0.5, scale_x=2.0, scale_y=0.5)
    b = np.asarray(boxes[0])
    d = 0.2 * 12.5  # map units
    np.testing.assert_allclose(
        b, [(8 - d) * 4 / 2.0, (8 - d) * 4 / 0.5,
            (8 + d) * 4 / 2.0, (8 + d) * 4 / 0.5], atol=1e-4)


def test_decode_landmarks_peak_in_box():
    lm = np.zeros((16, 16, 2), np.float32)
    lm[5, 6, 0] = 3.0   # inside box
    lm[2, 2, 0] = 9.0   # outside box — must be ignored
    lm[7, 7, 1] = 1.0
    boxes = jnp.array([[16., 12., 36., 32.]])  # covers map px x in [4,9], y in [3,8]
    pts = decode_landmarks(jnp.asarray(lm), boxes, jnp.array([True]), stride=4)
    np.testing.assert_allclose(np.asarray(pts[0, 0]), [24., 20.], atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts[0, 1]), [28., 28.], atol=1e-5)


# ---------------------------------------------------------------- integration

def _tiny_model(landmarks=0, refine=False):
    cfg = ModelCfg(num_landmarks=landmarks, use_refine=refine, width_mult=0.125)
    return DenseBox(cfg), cfg


@pytest.mark.slow
def test_config1_single_scale_640x480_cpu():
    """BASELINE config 1: single 640x480 image, single-scale inference,
    score+bbox heatmaps -> NMS decode, all on CPU."""
    model, _ = _tiny_model()
    img = jax.random.uniform(jax.random.key(0), (1, 480, 640, 3))
    params = model.init(jax.random.key(1), img[:, :64, :64])
    icfg = InferCfg(scales=(1.0,), score_thresh=-1e9, topk_per_scale=64,
                    max_dets=32)
    out = make_detect_fn(model, icfg, LabelCfg())(params, img)
    assert out["boxes"].shape == (1, 32, 4)
    assert out["scores"].shape == (1, 32)
    assert np.isfinite(np.asarray(out["boxes"])).all()
    assert np.asarray(out["valid"]).any()  # thresh -inf => candidates exist


def test_config2_pyramid_cross_scale_nms():
    """BASELINE config 2: batched multi-scale pyramid, on-device resize,
    cross-scale NMS (smaller canvas to keep CPU compile quick)."""
    model, _ = _tiny_model()
    imgs = jax.random.uniform(jax.random.key(0), (2, 128, 160, 3))
    params = model.init(jax.random.key(1), imgs[:1, :64, :64])
    icfg = InferCfg(scales=(0.5, 1.0, 1.5), score_thresh=-1e9,
                    topk_per_scale=32, max_dets=16)
    out = jax.jit(lambda p, x: detect_batch(model, p, x, icfg, LabelCfg()))(
        params, imgs)
    assert out["boxes"].shape == (2, 16, 4)
    assert np.isfinite(np.asarray(out["scores"][out["valid"]])).all()


def test_config3_landmark_branch_inference():
    """BASELINE config 3: joint landmark-heatmap branch, refined score fused
    with bbox maps, per-detection keypoints decoded."""
    model, _ = _tiny_model(landmarks=4, refine=True)
    imgs = jax.random.uniform(jax.random.key(0), (1, 96, 96, 3))
    params = model.init(jax.random.key(1), imgs)
    icfg = InferCfg(scales=(1.0,), score_thresh=-1e9, topk_per_scale=16,
                    max_dets=8)
    out = jax.jit(lambda p, x: detect_batch(model, p, x, icfg, LabelCfg()))(
        params, imgs)
    assert out["lm_points"].shape == (1, 8, 4, 2)
    assert np.isfinite(np.asarray(out["lm_points"])).all()


class _StubPyramidModel:
    """apply()-compatible stub emitting hand-built maps per pyramid level
    (identified by input resolution) — isolates detect_batch's plumbing."""

    def __init__(self, maps):
        self.maps = maps  # {map_h: (score, loc, lm)} numpy, unbatched

    def apply(self, params, imgs):
        b, h, w, _ = imgs.shape
        score, loc, lm = self.maps[h // 4]
        tile = lambda a: jnp.broadcast_to(jnp.asarray(a), (b,) + a.shape)  # noqa: E731
        return {"score": tile(score), "loc": tile(loc), "lm": tile(lm)}


def test_landmarks_decode_from_detection_source_scale():
    """A detection found only at scale 2.0 must take its landmarks from the
    scale-2.0 heatmap; a misleading peak planted in the scale-1.0 map (which
    the old nearest-to-1.0 policy would have read) must be ignored."""
    lcfg = LabelCfg()

    # scale 1.0: 64x64 input -> 16x16 map. No detection; misleading lm peak
    # inside where the detection's box lands in this map's coords.
    s1_score = np.full((16, 16, 1), -10.0, np.float32)
    s1_loc = np.zeros((16, 16, 4), np.float32)
    s1_lm = np.zeros((16, 16, 1), np.float32)
    s1_lm[7, 7, 0] = 3.0        # orig (28, 28) — the WRONG answer

    # scale 2.0: 128x128 input -> 32x32 map. One detection at map (16,16)
    # with border distances 4 map units => orig box (24,24,40,40).
    s2_score = np.full((32, 32, 1), -10.0, np.float32)
    s2_score[16, 16, 0] = 5.0
    s2_loc = np.full((32, 32, 4), 4.0 / lcfg.loc_norm, np.float32)
    s2_lm = np.zeros((32, 32, 1), np.float32)
    s2_lm[14, 18, 0] = 7.0      # orig (36, 28) — the RIGHT answer
    s2_lm[2, 2, 0] = 9.0        # outside the box; must be masked

    model = _StubPyramidModel({16: (s1_score, s1_loc, s1_lm),
                               32: (s2_score, s2_loc, s2_lm)})
    icfg = InferCfg(scales=(1.0, 2.0), score_thresh=0.0, topk_per_scale=8,
                    max_dets=4)
    imgs = jnp.zeros((1, 64, 64, 3))
    out = jax.jit(lambda x: detect_batch(model, None, x, icfg, lcfg))(imgs)
    v = np.asarray(out["valid"][0])
    assert v.sum() == 1
    d = int(np.nonzero(v)[0][0])
    np.testing.assert_allclose(np.asarray(out["boxes"][0, d]),
                               [24., 24., 40., 40.], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["lm_points"][0, d, 0]),
                               [36., 28.], atol=1.0)


def test_landmarks_degenerate_box_falls_back_to_center():
    """A valid detection whose box spans <1 map pixel must decode landmarks
    at the box center, not silently at pixel (0,0)."""
    lm = np.zeros((16, 16, 2), np.float32)
    lm[0, 0, :] = 9.0  # the old failure mode: all-masked argmax lands here
    boxes = jnp.array([[31.8, 31.8, 32.2, 32.2]])
    pts = decode_landmarks(jnp.asarray(lm), boxes, jnp.array([True]),
                           stride=4)
    np.testing.assert_allclose(np.asarray(pts[0]), [[32., 32.], [32., 32.]],
                               atol=1e-4)


def test_decode_landmarks_subpixel_refinement():
    """A peak with asymmetric neighbors decodes off-center toward the true
    sub-pixel position; integer argmax alone would not."""
    # 1-D parabola values for a true peak at x = 6.3: v(x) = 1 - (x-6.3)^2/4
    lm = np.zeros((16, 16, 1), np.float32)
    for dx in (-1, 0, 1):
        lm[5, 6 + dx, 0] = 1.0 - ((6 + dx) - 6.3) ** 2 / 4.0
        lm[5 + dx, 6, 0] = max(lm[5 + dx, 6, 0], 1.0 - (dx) ** 2 / 4.0)
    boxes = jnp.array([[8., 8., 50., 40.]])
    pts = decode_landmarks(jnp.asarray(lm), boxes, jnp.array([True]),
                           stride=4)
    x = float(pts[0, 0, 0]) / 4.0
    assert abs(x - 6.3) < 0.05, x
    # with subpixel off, lands exactly on the integer peak
    pts0 = decode_landmarks(jnp.asarray(lm), boxes, jnp.array([True]),
                            stride=4, subpixel=False)
    assert float(pts0[0, 0, 0]) == 24.0


def test_decode_landmarks_windowed_near_edge():
    """The windowed search (memory fix: full-map masking is O(D*h*w*L) and
    OOMed on TPU) must clamp its crop at map borders and still find an
    in-box peak for a detection near the image edge."""
    lm = np.zeros((64, 64, 1), np.float32)
    lm[60, 61, 0] = 5.0          # orig (244, 240), inside the box
    lm[30, 30, 0] = 9.0          # far outside; a clamped window never sees it
    boxes = jnp.array([[232., 228., 252., 250.]])
    pts = decode_landmarks(jnp.asarray(lm), boxes, jnp.array([True]),
                           stride=4, window=16)
    np.testing.assert_allclose(np.asarray(pts[0, 0]), [244., 240.], atol=1e-4)


def test_decode_landmarks_anchor_restricted_search():
    """With box-relative anchors, a FOREIGN peak inside the box (e.g. an
    overlapping object's corner) far from the channel's expected position
    must be rejected in favor of the near-anchor peak — the measured NME
    tail killer (BASELINE.md round 2)."""
    lm = np.zeros((32, 32, 1), np.float32)
    # channel 0 expects the TOP-LEFT corner of the box (anchor (0,0)).
    lm[6, 6, 0] = 2.0    # near the TL corner of the box below — RIGHT
    lm[18, 18, 0] = 9.0  # strong foreign peak inside the box — WRONG
    boxes = jnp.array([[24., 24., 80., 80.]])   # map px 6..20
    anchors = jnp.array([[0.0, 0.0]])
    pts = decode_landmarks(jnp.asarray(lm), boxes, jnp.array([True]),
                           stride=4, anchors=anchors)
    np.testing.assert_allclose(np.asarray(pts[0, 0]), [24., 24.], atol=1e-4)
    # without anchors the foreign peak wins (documents why anchors exist)
    pts_free = decode_landmarks(jnp.asarray(lm), boxes, jnp.array([True]),
                                stride=4)
    np.testing.assert_allclose(np.asarray(pts_free[0, 0]), [72., 72.],
                               atol=1e-4)


def test_decode_landmarks_box_larger_than_window():
    """Boxes spanning more than the search window: anchored decode centers
    each landmark's window on its expected position and still finds the
    true corner peak; anchor-less decode falls back to the box center
    instead of passing off a cropped-search result as a real peak
    (round-2 code-review repro)."""
    lm = np.zeros((100, 100, 1), np.float32)
    lm[13, 13, 0] = 5.0                      # TL corner of the box, orig (52,52)
    boxes = jnp.array([[52., 52., 352., 352.]])   # spans 75 map px > window 32
    anchors = jnp.array([[0.0, 0.0]])
    pts = decode_landmarks(jnp.asarray(lm), boxes, jnp.array([True]),
                           stride=4, window=32, anchors=anchors)
    np.testing.assert_allclose(np.asarray(pts[0, 0]), [52., 52.], atol=1e-4)
    # without anchors: centered 32-px crop cannot see the corner -> center
    pts_free = decode_landmarks(jnp.asarray(lm), boxes, jnp.array([True]),
                                stride=4, window=32)
    np.testing.assert_allclose(np.asarray(pts_free[0, 0]), [202., 202.],
                               atol=1e-4)
