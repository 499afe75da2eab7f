"""Data pipeline tests: KITTI parsing, on-device patch sampling geometry,
prefetch loader."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from densebox_tpu.config import LabelCfg
from densebox_tpu.data.kitti import load_dataset, parse_label_file
from densebox_tpu.data.patches import sample_patches
from densebox_tpu.data.pipeline import PrefetchLoader, canvas_batch

KITTI_LINE = ("Car 0.00 0 -1.58 {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
              "1.57 1.73 4.15 1.00 1.75 13.22 -1.62")


def _write_fixture(tmp_path, n=4):
    import cv2

    img_dir = tmp_path / "image_2"
    lab_dir = tmp_path / "label_2"
    img_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.RandomState(0)
    truth = {}
    for i in range(n):
        h, w = 200, 320
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        boxes = []
        lines = []
        for _ in range(rng.randint(1, 4)):
            x1, y1 = rng.uniform(10, 200), rng.uniform(10, 100)
            bw, bh = rng.uniform(30, 80), rng.uniform(25, 60)
            boxes.append([x1, y1, x1 + bw, y1 + bh])
            lines.append(KITTI_LINE.format(x1=x1, y1=y1, x2=x1 + bw,
                                           y2=y1 + bh))
        lines.append("DontCare -1 -1 -10 0 0 10 10 -1 -1 -1 -1000 -1000 -1000 -10")
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), img)
        (lab_dir / f"{i:06d}.txt").write_text("\n".join(lines))
        truth[f"{i:06d}"] = np.asarray(boxes, np.float32)
    return str(img_dir), str(lab_dir), truth


def test_parse_and_load(tmp_path):
    img_dir, lab_dir, truth = _write_fixture(tmp_path)
    samples = load_dataset(img_dir, lab_dir)
    assert len(samples) == len(truth)
    for s in samples:
        stem = os.path.basename(s.image_path).split(".")[0]
        np.testing.assert_allclose(s.boxes, truth[stem], atol=1e-2)


def test_parse_skips_other_classes(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("Pedestrian 0 0 0 1 2 30 40 1 1 1 0 0 0 0\n"
                 + KITTI_LINE.format(x1=5, y1=6, x2=50, y2=60))
    boxes, _ = parse_label_file(str(p))
    assert boxes.shape == (1, 4)
    np.testing.assert_allclose(boxes[0], [5, 6, 50, 60], atol=1e-3)


def test_canvas_batch_downscales_to_fit(tmp_path):
    img_dir, lab_dir, _ = _write_fixture(tmp_path, n=2)
    samples = load_dataset(img_dir, lab_dir)
    batch = canvas_batch(samples, canvas_hw=(100, 160), max_boxes=8)
    assert batch["image"].shape == (2, 100, 160, 3)
    # 200x320 -> fits at factor 0.5; boxes scaled accordingly
    assert batch["box_valid"].any()
    assert batch["boxes"][batch["box_valid"]].max() <= 160.0


def test_sample_patches_anchor_geometry():
    """The anchor box must land in-band and (mostly) centered after crop."""
    cfg = LabelCfg(patch_size=64, std_height_px=20.0)
    b, hc, wc = 8, 256, 256
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(b, hc, wc, 3).astype(np.float32))
    ctr = rng.uniform(60, 196, (b, 1, 2)).astype(np.float32)
    hgt = rng.uniform(15, 60, (b, 1)).astype(np.float32)
    boxes = np.concatenate([ctr[..., :1] - hgt[..., None] / 2,
                            ctr[..., 1:] - hgt[..., None] / 2,
                            ctr[..., :1] + hgt[..., None] / 2,
                            ctr[..., 1:] + hgt[..., None] / 2], -1)
    out = jax.jit(lambda k, i, bx, v: sample_patches(
        k, i, bx, v, cfg, neg_frac=0.0, max_translate_frac=0.0, hflip=False))(
        jax.random.key(0), images, jnp.asarray(boxes), jnp.ones((b, 1), bool))
    assert out["image"].shape == (b, 64, 64, 3)
    tb = np.asarray(out["boxes"])[:, 0]
    tv = np.asarray(out["box_valid"])[:, 0]
    assert tv.all()
    heights = tb[:, 3] - tb[:, 1]
    lo, hi = cfg.scale_band
    # anchor height in patch px within the jitter band (resize semantics slack)
    assert (heights >= cfg.std_height_px * lo - 1).all()
    assert (heights <= cfg.std_height_px * hi + 1).all()
    # anchor centered (no translation jitter)
    cx = (tb[:, 0] + tb[:, 2]) / 2
    np.testing.assert_allclose(cx, 32.0, atol=1.0)


def test_sample_patches_pixels_match_crop():
    """Cropped pixels equal a direct resize of the window region."""
    cfg = LabelCfg(patch_size=32, std_height_px=16.0)
    rng = np.random.RandomState(0)
    img = rng.rand(1, 128, 128, 3).astype(np.float32)
    # one box, exact std height with scale u forced by seed -> compare coarsely:
    boxes = np.array([[[40.0, 40.0, 72.0, 72.0]]], np.float32)
    out = sample_patches(jax.random.key(3), jnp.asarray(img),
                         jnp.asarray(boxes), jnp.ones((1, 1), bool), cfg,
                         neg_frac=0.0, max_translate_frac=0.0, hflip=False)
    patch = np.asarray(out["image"][0])
    tb = np.asarray(out["boxes"][0, 0])
    # the transformed box must frame the same bright/dark structure: check
    # mean inside transformed box vs mean inside original box
    m_orig = img[0, 40:72, 40:72].mean()
    x1, y1, x2, y2 = np.clip(tb, 0, 31).astype(int)
    m_patch = patch[y1:y2 + 1, x1:x2 + 1].mean()
    assert abs(m_orig - m_patch) < 0.05


def test_hflip_flips_boxes_and_pixels():
    cfg = LabelCfg(patch_size=32, std_height_px=16.0)
    rng = np.random.RandomState(0)
    img = rng.rand(4, 64, 64, 3).astype(np.float32)
    boxes = np.tile(np.array([[[10.0, 20.0, 30.0, 40.0]]], np.float32),
                    (4, 1, 1))
    out = sample_patches(jax.random.key(1), jnp.asarray(img),
                         jnp.asarray(boxes), jnp.ones((4, 1), bool), cfg,
                         neg_frac=0.0, max_translate_frac=0.0, hflip=True)
    flip = np.asarray(out["flipped"])
    if flip.any() and (~flip).any():
        i_f = int(np.argmax(flip))
        tb = np.asarray(out["boxes"])
        # flipped boxes remain ordered x1 < x2
        assert (tb[:, 0, 0] < tb[:, 0, 2]).all()


def test_prefetch_loader_yields_device_batches(tmp_path):
    img_dir, lab_dir, _ = _write_fixture(tmp_path)
    samples = load_dataset(img_dir, lab_dir)
    loader = PrefetchLoader(samples, batch_size=2, canvas_hw=(128, 160),
                            max_boxes=8)
    it = iter(loader)
    for _ in range(3):
        batch = next(it)
        assert batch["image"].shape == (2, 128, 160, 3)
        assert isinstance(batch["image"], jax.Array)
    it.close()


def test_hflip_permutes_landmark_channels():
    """Flip must swap mirror-twin landmark identities, not just mirror
    coordinates (regression: without the permutation each channel trains on
    a 50/50 mix of its mirror twin -> NME ~0.5 box heights)."""
    cfg = LabelCfg(patch_size=32, std_height_px=16.0,
                   lm_flip_perm=(1, 0, 3, 2))
    rng = np.random.RandomState(0)
    img = rng.rand(8, 64, 64, 3).astype(np.float32)
    boxes = np.tile(np.array([[[20., 20., 36., 36.]]], np.float32), (8, 1, 1))
    # corners TL TR BR BL
    lms = np.tile(np.array([[[[20., 20.], [36., 20.],
                              [36., 36.], [20., 36.]]]], np.float32),
                  (8, 1, 1, 1))
    out = sample_patches(jax.random.key(2), jnp.asarray(img),
                         jnp.asarray(boxes), jnp.ones((8, 1), bool), cfg,
                         neg_frac=0.0, max_translate_frac=0.0, hflip=True,
                         landmarks=jnp.asarray(lms))
    flip = np.asarray(out["flipped"])
    assert flip.any() and (~flip).any()
    tb = np.asarray(out["boxes"])[:, 0]
    lm = np.asarray(out["landmarks"])[:, 0]
    for i in range(8):
        x1, y1, x2, y2 = tb[i]
        # channel 0 must ALWAYS be the top-left corner of the (possibly
        # flipped) box; channel 1 the top-right
        np.testing.assert_allclose(lm[i, 0], [x1, y1], atol=1.01)
        np.testing.assert_allclose(lm[i, 1], [x2, y1], atol=1.01)
        np.testing.assert_allclose(lm[i, 2], [x2, y2], atol=1.01)
        np.testing.assert_allclose(lm[i, 3], [x1, y2], atol=1.01)


def test_prefetch_loader_propagates_producer_failure(tmp_path):
    """A corrupt/missing image must fail the training loop loudly within
    one batch — a silently-dead producer thread would leave the consumer
    blocked on q.get() forever (round-2 verdict, weak #2)."""
    import pytest

    from densebox_tpu.data.kitti import Sample

    samples = [Sample(image_path=str(tmp_path / "missing.png"),
                      boxes=np.zeros((0, 4), np.float32))] * 2
    loader = PrefetchLoader(samples, batch_size=2, canvas_hw=(32, 32),
                            max_boxes=2)
    with pytest.raises(RuntimeError, match="producer thread failed"):
        next(iter(loader))


def test_kitti_keypoint_extension_parsing(tmp_path):
    """GT lines may append 'lx ly' pairs after the 15 standard KITTI
    fields (the framework's landmark extension, data/kitti.py docstring);
    coords < 0 mark invisible keypoints."""
    lab = tmp_path / "000000.txt"
    base = "Car 0.00 0 -1.58 {b} 1.57 1.73 4.15 1.00 1.75 13.22 -1.62"
    lab.write_text("\n".join([
        base.format(b="10 20 40 60") + " 10 20 40 20 40 60 10 60",
        base.format(b="50 10 90 70") + " 50 10 -1 -1 90 70 50 70",
        base.format(b="5 5 25 45"),          # no keypoints at all
    ]))
    from densebox_tpu.data.kitti import parse_label_file

    boxes, lms = parse_label_file(str(lab), num_landmarks=4)
    assert boxes.shape == (3, 4) and lms.shape == (3, 4, 2)
    np.testing.assert_allclose(lms[0], [[10, 20], [40, 20], [40, 60],
                                        [10, 60]])
    assert (lms[1, 1] < 0).all()             # invisible marker preserved
    assert (lms[2] < 0).all()                # absent extension -> invisible
    # without the flag the landmark columns are ignored
    boxes2, none = parse_label_file(str(lab))
    assert none is None and boxes2.shape == (3, 4)


def test_canvas_batch_carries_landmarks(tmp_path):
    import cv2

    from densebox_tpu.data.kitti import Sample

    img_path = str(tmp_path / "a.png")
    cv2.imwrite(img_path, np.zeros((100, 200, 3), np.uint8))
    lms = np.array([[[20., 30.], [-1., -1.]]], np.float32)
    s = Sample(image_path=img_path,
               boxes=np.array([[10., 20., 60., 80.]], np.float32),
               landmarks=lms)
    # canvas smaller than the image: downscale factor f = 0.5 applies to
    # boxes AND landmarks
    b = canvas_batch([s], (50, 100), max_boxes=2, num_landmarks=2)
    assert b["landmarks"].shape == (1, 2, 2, 2)
    np.testing.assert_allclose(b["landmarks"][0, 0, 0], [10., 15.])
    assert b["lm_valid"][0, 0, 0] and not b["lm_valid"][0, 0, 1]
    np.testing.assert_allclose(b["boxes"][0, 0], [5., 10., 30., 40.])


def test_sample_patches_respects_lm_valid():
    """Occluded keypoints from the annotation must stay invalid through
    on-device patch sampling (they feed the GT rasterizer's lm_valid)."""
    cfg = LabelCfg(patch_size=32, std_height_px=16.0)
    rng = np.random.RandomState(0)
    img = rng.rand(4, 64, 64, 3).astype(np.float32)
    boxes = np.tile(np.array([[[20., 20., 36., 36.]]], np.float32),
                    (4, 1, 1))
    lms = np.tile(np.array([[[[20., 20.], [36., 36.]]]], np.float32),
                  (4, 1, 1, 1))
    lm_valid = np.tile(np.array([[[True, False]]]), (4, 1, 1))
    out = sample_patches(jax.random.key(0), jnp.asarray(img),
                         jnp.asarray(boxes), jnp.ones((4, 1), bool), cfg,
                         neg_frac=0.0, hflip=False,
                         landmarks=jnp.asarray(lms),
                         lm_valid=jnp.asarray(lm_valid))
    lv = np.asarray(out["lm_valid"])
    bv = np.asarray(out["box_valid"])
    assert not lv[..., 1].any()
    assert (lv[..., 0] == bv[:, 0]).all()


def test_kitti_meta_parsing(tmp_path):
    """Truncation/occlusion columns + DontCare regions surface through
    parse_label_file(return_meta=True) and load_dataset (the fields the
    official eval protocol bins by — eval.py::evaluate_kitti)."""
    import cv2
    from densebox_tpu.data.kitti import load_dataset, parse_label_file

    (tmp_path / "image_2").mkdir()
    (tmp_path / "label_2").mkdir()
    label = "\n".join([
        "Car 0.20 1 -1.58 10.0 10.0 60.0 60.0 1.6 1.7 4.2 1 1 13 -1.6",
        "DontCare -1 -1 -10 90.0 5.0 120.0 25.0 -1 -1 -1 -1000 -1000 -1000 -10",
        "Van 0.00 2 -1.58 70.0 10.0 95.0 40.0 1.6 1.7 4.2 1 1 13 -1.6",
    ])
    (tmp_path / "label_2" / "000000.txt").write_text(label)
    cv2.imwrite(str(tmp_path / "image_2" / "000000.png"),
                np.zeros((80, 130, 3), np.uint8))

    boxes, _, meta = parse_label_file(
        str(tmp_path / "label_2" / "000000.txt"), return_meta=True)
    assert boxes.shape == (2, 4)
    assert np.allclose(meta["truncation"], [0.20, 0.00])
    assert meta["occlusion"].tolist() == [1, 2]
    assert meta["dontcare"].tolist() == [[90.0, 5.0, 120.0, 25.0]]

    s = load_dataset(str(tmp_path / "image_2"), str(tmp_path / "label_2"))[0]
    assert s.occlusion.tolist() == [1, 2]
    assert s.dontcare.shape == (1, 4)

    # canvas_batch reports the image->canvas scale factor (eval maps
    # predictions back to original coordinates for the KITTI protocol)
    from densebox_tpu.data.pipeline import canvas_batch
    b = canvas_batch([s], canvas_hw=(40, 65), max_boxes=4)
    assert abs(b["scale"][0] - 0.5) < 1e-6
