"""Native (C++) loader core vs the Python reference path (SURVEY.md C8;
the reference's DataLoader-core-equivalent native component)."""

import os

import numpy as np
import pytest

from densebox_tpu.data.kitti import Sample
from densebox_tpu.data.pipeline import canvas_batch
from densebox_tpu.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(),
    reason="no compiler / OpenCV dev libs on this machine")


def _write_pngs(tmp_path, shapes, seed=0):
    import cv2

    rng = np.random.RandomState(seed)
    paths = []
    for i, (h, w) in enumerate(shapes):
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        p = str(tmp_path / f"img{i}.png")
        assert cv2.imwrite(p, img)
        paths.append(p)
    return paths


def _samples(paths, rng):
    out = []
    for p in paths:
        boxes = rng.uniform(0, 40, (3, 4)).astype(np.float32)
        boxes[:, 2:] += boxes[:, :2]
        lms = rng.uniform(0, 40, (3, 4, 2)).astype(np.float32)
        lms[0, 1] = -1.0          # invisible keypoint
        out.append(Sample(image_path=p, boxes=boxes, landmarks=lms))
    return out


def test_native_matches_python_no_resize(tmp_path):
    """Images smaller than the canvas: pure decode+normalize+pad — must be
    BITWISE identical to the Python path."""
    paths = _write_pngs(tmp_path, [(40, 56), (64, 48), (30, 30)])
    samples = _samples(paths, np.random.RandomState(1))
    a = canvas_batch(samples, (64, 64), 4, num_landmarks=4,
                     backend="python")
    b = canvas_batch(samples, (64, 64), 4, num_landmarks=4,
                     backend="native")
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_native_matches_python_with_resize(tmp_path):
    """Oversized images go through INTER_AREA fit-resize. The bundled cv2
    wheel (5.x) and the system C++ OpenCV (4.6) are different builds, so
    demand near-equality of pixels and exact equality of geometry."""
    paths = _write_pngs(tmp_path, [(100, 150), (200, 80)], seed=2)
    samples = _samples(paths, np.random.RandomState(3))
    a = canvas_batch(samples, (64, 64), 4, backend="python")
    b = canvas_batch(samples, (64, 64), 4, backend="native")
    np.testing.assert_array_equal(a["scale"], b["scale"])
    np.testing.assert_array_equal(a["boxes"], b["boxes"])
    np.testing.assert_allclose(a["image"], b["image"], atol=2e-3)
    # the padded region must be exactly zero: sample 1 is 200x80 ->
    # f = 64/200 = 0.32 -> resized to 64x25, so columns >= 25 are pad
    assert float(np.abs(b["image"][1, :, 25:]).max()) == 0.0
    assert float(np.abs(a["image"][1, :, 25:]).max()) == 0.0


def test_native_missing_file_raises(tmp_path):
    paths = _write_pngs(tmp_path, [(20, 20)])
    samples = _samples(paths + [str(tmp_path / "nope.png")],
                       np.random.RandomState(0))
    samples[1] = Sample(image_path=str(tmp_path / "nope.png"),
                        boxes=np.zeros((0, 4), np.float32))
    with pytest.raises(FileNotFoundError):
        canvas_batch(samples, (32, 32), 2, backend="native")


def test_native_threadpool_scales_batch(tmp_path):
    """A batch bigger than the thread count loads completely and in order."""
    paths = _write_pngs(tmp_path, [(24 + i, 30) for i in range(17)], seed=5)
    samples = [Sample(image_path=p, boxes=np.zeros((0, 4), np.float32))
               for p in paths]
    out = canvas_batch(samples, (48, 48), 2, backend="native")
    ref = canvas_batch(samples, (48, 48), 2, backend="python")
    np.testing.assert_array_equal(out["image"], ref["image"])
