"""Eval harness tests: AP math vs hand-computed cases, and the end-to-end
config-5-style check — DP training on synthetic data reaches high AP."""

import jax
import numpy as np
import pytest

from densebox_tpu.eval import (average_precision, evaluate_detections,
                               detections_to_numpy, heatmap_mse, match_image)


def test_match_image_basic():
    gt = np.array([[0., 0., 10., 10.], [20., 20., 30., 30.]])
    pred = np.array([[0., 0., 10., 10.],     # perfect match
                     [1., 1., 11., 11.],     # duplicate -> FP (gt taken)
                     [50., 50., 60., 60.]])  # miss -> FP
    scores = np.array([0.9, 0.8, 0.7])
    s, tp = match_image(pred, scores, gt, 0.5)
    assert tp.tolist() == [True, False, False]


def test_ap_perfect_and_worst():
    # all predictions TP covering all GT -> AP 1
    assert average_precision(np.array([0.9, 0.8]), np.array([True, True]),
                             2) == pytest.approx(1.0)
    # no TP -> AP 0
    assert average_precision(np.array([0.9]), np.array([False]), 2) == 0.0
    # half the GT found with a leading FP:
    # ranks: FP(0.9), TP(0.8) -> precision at recall 0.5 is 1/2
    ap = average_precision(np.array([0.9, 0.8]), np.array([False, True]), 2)
    assert ap == pytest.approx(0.25)


def test_evaluate_detections_aggregates():
    imgs = [
        {"pred_boxes": np.array([[0., 0., 10., 10.]]),
         "pred_scores": np.array([0.9]),
         "gt_boxes": np.array([[0., 0., 10., 10.]])},
        {"pred_boxes": np.zeros((0, 4)), "pred_scores": np.zeros(0),
         "gt_boxes": np.array([[5., 5., 15., 15.]])},
    ]
    res = evaluate_detections(imgs)
    assert res["n_gt"] == 2
    assert res["ap"] == pytest.approx(0.5)


def test_heatmap_mse():
    a = {"score": np.zeros((1, 4, 4, 1))}
    b = {"score": np.full((1, 4, 4, 1), 0.1)}
    assert heatmap_mse(a, b)["score"] == pytest.approx(0.01)


@pytest.mark.slow
def test_config5_training_reaches_detection_ap():
    """BASELINE config 5 end to end: DP training run on the synthetic
    vehicle-style set (8 fake devices), then real AP on held-out data."""
    from densebox_tpu.config import (DenseBoxConfig, InferCfg, LabelCfg,
                                     ModelCfg, TrainCfg)
    from densebox_tpu.data import synthetic_batch
    from densebox_tpu.infer import make_detect_fn
    from densebox_tpu.models import DenseBox
    from densebox_tpu.train import fit

    cfg = DenseBoxConfig(
        model=ModelCfg(width_mult=0.125),
        label=LabelCfg(patch_size=64, std_height_px=20.0),
        train=TrainCfg(batch_size=8, learning_rate=3e-3, max_boxes=2))
    canvas_cfg = LabelCfg(patch_size=128, std_height_px=20.0)

    def fetch(step):
        return synthetic_batch(jax.random.key(step), 8, canvas_cfg,
                               max_boxes=2)

    result = fit(cfg, fetch, num_steps=250)
    assert len(jax.devices()) == 8  # DP mesh engaged

    model = DenseBox(cfg.model)
    icfg = InferCfg(scales=(1.0,), score_thresh=0.4, topk_per_scale=64,
                    max_dets=8)
    detect = make_detect_fn(model, icfg, cfg.label)

    per_image = []
    for i in range(4):
        b = synthetic_batch(jax.random.key(10_000 + i), 4, canvas_cfg,
                            max_boxes=2)
        params = result.state.params
        dets = detect(params, b["image"])
        per_image += detections_to_numpy(dets, b["boxes"], b["box_valid"])
    res = evaluate_detections(per_image, iou_thresh=0.5)
    assert res["n_gt"] > 0
    assert res["ap"] > 0.5, res


def test_landmark_nme():
    from densebox_tpu.eval import landmark_nme

    gt = np.array([[[0., 0.], [10., 0.]]])
    pred = np.array([[[3., 4.], [10., 0.]]])  # one 5px error, one exact
    assert landmark_nme(pred, gt, np.array([10.0])) == pytest.approx(0.25)


# --- official KITTI protocol (eval.py::evaluate_kitti) ------------------

def test_ap_r40_perfect_and_empty():
    from densebox_tpu.eval import average_precision_r40
    assert average_precision_r40(
        np.array([0.9, 0.8]), np.array([True, True]), 2) == pytest.approx(1.0)
    assert average_precision_r40(np.zeros(0), np.zeros(0, bool), 2) == 0.0
    assert np.isnan(average_precision_r40(np.zeros(0), np.zeros(0, bool), 0))


def test_match_image_kitti_ignore_semantics():
    """Dets matching ignored GTs / DontCare / sub-min-height are neither
    TP nor FP; only real misses count as FP (devkit semantics)."""
    from densebox_tpu.eval import match_image_kitti

    gt = np.array([[0., 0., 50., 50.],      # relevant
                   [100., 0., 110., 10.]])  # ignored (e.g. too small)
    ignored = np.array([False, True])
    dontcare = np.array([[200., 200., 260., 260.]])
    pred = np.array([
        [0., 0., 50., 50.],        # TP on the relevant GT
        [100., 0., 110., 10.],     # matches ignored GT -> dropped
        [205., 205., 255., 255.],  # inside DontCare -> dropped
        [300., 300., 310., 310.],  # unmatched, height 10 < 25 -> dropped
        [400., 300., 440., 340.],  # unmatched, height 40 -> FP
    ])
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5])
    s, tp, n_gt = match_image_kitti(pred, scores, gt, ignored, dontcare,
                                    iou_thresh=0.5, min_height=25.0)
    assert n_gt == 1
    assert s.tolist() == pytest.approx([0.9, 0.5])
    assert tp.tolist() == [True, False]


def test_match_image_kitti_prefers_relevant_gt():
    """A det overlapping both a relevant and an ignored GT above threshold
    must claim the relevant one (even at lower IoU), not vanish."""
    from densebox_tpu.eval import match_image_kitti

    gt = np.array([[0., 0., 40., 40.],    # relevant
                   [2., 2., 40., 40.]])   # ignored, slightly better IoU
    ignored = np.array([False, True])
    pred = np.array([[1., 1., 40., 40.]])
    s, tp, n_gt = match_image_kitti(pred, np.array([0.9]), gt, ignored,
                                    np.zeros((0, 4)), 0.5, 25.0)
    assert tp.tolist() == [True] and n_gt == 1


def test_evaluate_kitti_difficulty_bins():
    """Bin membership over (height, occlusion, truncation): each harder
    bin adds its GTs to n_gt, and out-of-bin GTs absorb their matching
    dets without penalizing AP."""
    from densebox_tpu.eval import evaluate_kitti

    gt = np.array([[0., 0., 50., 50.],        # easy (h=50, occ 0)
                   [100., 0., 130., 30.],     # moderate (h=30, occ 1)
                   [200., 0., 230., 30.],     # hard (h=30, occ 2)
                   [300., 0., 320., 20.]])    # ignored everywhere (h=20)
    item = {
        "pred_boxes": gt.copy(),              # perfect det on every GT
        "pred_scores": np.array([0.9, 0.8, 0.7, 0.6]),
        "gt_boxes": gt,
        "gt_truncation": np.zeros(4),
        "gt_occlusion": np.array([0, 1, 2, 0]),
        "dontcare": np.zeros((0, 4)),
    }
    res = evaluate_kitti([item], iou_thresh=0.7)
    assert res["n_gt_easy"] == 1
    assert res["n_gt_moderate"] == 2
    assert res["n_gt_hard"] == 3
    for d in ("easy", "moderate", "hard"):
        assert res[f"ap_{d}"] == pytest.approx(1.0)


def test_evaluate_kitti_truncation_bins():
    from densebox_tpu.eval import evaluate_kitti

    gt = np.array([[0., 0., 50., 50.]])
    item = {"pred_boxes": gt.copy(), "pred_scores": np.array([0.9]),
            "gt_boxes": gt, "gt_truncation": np.array([0.4]),
            "gt_occlusion": np.zeros(1, np.int64)}
    res = evaluate_kitti([item])
    # truncation 0.4 > 0.30 excludes moderate; within hard's 0.50
    assert res["n_gt_easy"] == 0 and res["n_gt_moderate"] == 0
    assert res["n_gt_hard"] == 1
    assert res["ap_hard"] == pytest.approx(1.0)


def test_match_landmarks_skips_undecoded_predictions():
    """Detections past the lm_topk decode cap carry zeroed lm_points with
    lm_valid all-False; _match_landmarks must exclude them from the NME
    instead of scoring (0, 0) as real predictions (round-3 advice)."""
    from densebox_tpu.cli import _match_landmarks

    box = np.array([10.0, 10.0, 30.0, 30.0], np.float32)
    lm = np.array([[12.0, 14.0], [26.0, 25.0]], np.float32)
    dets = {
        "boxes": np.stack([box, box])[None],          # (1, 2, 4)
        "valid": np.array([[True, True]]),
        "lm_points": np.stack([lm, np.zeros_like(lm)])[None],
        "lm_valid": np.array([[[True, True], [False, False]]]),
    }
    batch = {
        "boxes": box[None, None],                     # (1, 1, 4)
        "box_valid": np.array([[True]]),
        "landmarks": lm[None, None],                  # (1, 1, 2, 2)
    }
    samples = _match_landmarks(dets, batch)
    # only the decoded detection contributes; the capped one (all-False
    # lm_valid, zeroed points) is excluded
    assert len(samples) == 1
    np.testing.assert_array_equal(samples[0][0], lm)
