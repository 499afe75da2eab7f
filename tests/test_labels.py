"""GT rasterizer tests (SURVEY.md §5.2): property checks, numpy-loop reference
parity (the reference repo's semantics, SURVEY.md §4.3), and the
decode∘rasterize identity."""

import jax.numpy as jnp
import numpy as np
import pytest

from densebox_tpu.config import LabelCfg
from densebox_tpu.ops.decode import decode_topk
from densebox_tpu.ops.labels import LM_RADIUS, rasterize_batch


def numpy_rasterize(boxes, box_valid, cfg: LabelCfg,
                    landmarks=None, lm_valid=None):
    """Per-pixel loop reference mirroring the reference repo's numpy-loop
    rasterizer (SURVEY.md §4.3). Deliberately slow and literal."""
    m = cfg.map_size
    b, k, _ = boxes.shape
    lo, hi = cfg.height_band_map
    score = np.zeros((b, m, m, 1), np.float32)
    loc = np.zeros((b, m, m, 4), np.float32)
    ignore = np.zeros((b, m, m, 1), np.float32)
    num_l = landmarks.shape[2] if landmarks is not None else 0
    lm = np.zeros((b, m, m, num_l), np.float32)

    for i in range(b):
        for iy in range(m):
            for ix in range(m):
                best, best_d2 = -1, np.inf
                any_gray = False
                for j in range(k):
                    if not box_valid[i, j]:
                        continue
                    bx = boxes[i, j] / cfg.stride
                    h = bx[3] - bx[1]
                    cx, cy = (bx[0] + bx[2]) / 2, (bx[1] + bx[3]) / 2
                    rc = cfg.rc_ratio * h
                    d2 = (ix - cx) ** 2 + (iy - cy) ** 2
                    if d2 <= (rc + cfg.rnear) ** 2:
                        any_gray = True
                    if lo <= h <= hi and d2 <= rc ** 2 and d2 < best_d2:
                        best, best_d2 = j, d2
                if best >= 0:
                    bx = boxes[i, best] / cfg.stride
                    score[i, iy, ix, 0] = 1.0
                    loc[i, iy, ix] = [(ix - bx[0]) / cfg.loc_norm,
                                      (iy - bx[1]) / cfg.loc_norm,
                                      (bx[2] - ix) / cfg.loc_norm,
                                      (bx[3] - iy) / cfg.loc_norm]
                elif any_gray:
                    ignore[i, iy, ix, 0] = 1.0
                for j in range(k):
                    if landmarks is None or not box_valid[i, j]:
                        continue
                    bx = boxes[i, j] / cfg.stride
                    h = bx[3] - bx[1]
                    if not (lo <= h <= hi):
                        continue
                    for l in range(num_l):
                        if lm_valid is not None and not lm_valid[i, j, l]:
                            continue
                        p = landmarks[i, j, l] / cfg.stride
                        if (ix - p[0]) ** 2 + (iy - p[1]) ** 2 <= LM_RADIUS ** 2:
                            lm[i, iy, ix, l] = 1.0
    out = {"score": score, "loc": loc, "loc_mask": score.copy(),
           "ignore": ignore}
    if landmarks is not None:
        out["lm"] = lm
    return out


def _small_cfg():
    # 64-px patches -> 16x16 maps keep the loop reference fast
    return LabelCfg(patch_size=64, std_height_px=20.0)


def _rand_instances(seed, b=2, k=3, num_lm=0, cfg=None):
    rng = np.random.RandomState(seed)
    cfg = cfg or _small_cfg()
    ps = cfg.patch_size
    ctr = rng.uniform(8, ps - 8, (b, k, 2))
    # heights spanning in-band and out-of-band
    hgt = rng.uniform(0.5 * cfg.std_height_px, 1.6 * cfg.std_height_px, (b, k))
    wid = hgt * rng.uniform(0.7, 1.3, (b, k))
    boxes = np.stack([ctr[..., 0] - wid / 2, ctr[..., 1] - hgt / 2,
                      ctr[..., 0] + wid / 2, ctr[..., 1] + hgt / 2], -1)
    valid = rng.rand(b, k) > 0.2
    lms = lmv = None
    if num_lm:
        off = rng.uniform(-0.3, 0.3, (b, k, num_lm, 2))
        lms = ctr[:, :, None, :] + off * np.stack([wid, hgt], -1)[:, :, None, :]
        lmv = rng.rand(b, k, num_lm) > 0.2
    return boxes.astype(np.float32), valid, lms, lmv


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("num_lm", [0, 3])
def test_matches_numpy_loop_reference(seed, num_lm):
    cfg = _small_cfg()
    boxes, valid, lms, lmv = _rand_instances(seed, num_lm=num_lm, cfg=cfg)
    want = numpy_rasterize(boxes, valid, cfg, lms, lmv)
    got = rasterize_batch(
        jnp.asarray(boxes), jnp.asarray(valid), cfg,
        None if lms is None else jnp.asarray(lms),
        None if lmv is None else jnp.asarray(lmv))
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_allclose(
            np.asarray(got[key]), want[key], atol=1e-5,
            err_msg=f"map '{key}' mismatch (seed={seed})")


def test_single_centered_box_properties():
    cfg = LabelCfg()  # full 240 -> 60 geometry, std height 50 px
    box = np.array([[[95.0, 95.0, 145.0, 145.0]]])  # 50x50 centered
    out = rasterize_batch(jnp.asarray(box), jnp.ones((1, 1), bool), cfg)
    score = np.asarray(out["score"][0, :, :, 0])
    ign = np.asarray(out["ignore"][0, :, :, 0])
    # positive disc radius 0.3 * 12.5 = 3.75 map px around center (30, 30)
    ys, xs = np.nonzero(score)
    r = np.sqrt((ys - 30.0) ** 2 + (xs - 30.0) ** 2)
    assert r.max() <= 3.75 + 1e-6 and len(ys) > 0
    assert score[30, 30] == 1.0
    # gray ring: positives' dilation by exactly rnear=2, nothing else
    gys, gxs = np.nonzero(ign)
    gr = np.sqrt((gys - 30.0) ** 2 + (gxs - 30.0) ** 2)
    assert gr.min() > 3.74 and gr.max() <= 5.75 + 1e-6
    # no positives from out-of-band: none ignored at map border
    assert ign[0].sum() == 0
    # regression targets at center: distances to borders = 6.25 map units
    np.testing.assert_allclose(np.asarray(out["loc"][0, 30, 30]),
                               [0.5, 0.5, 0.5, 0.5], atol=1e-5)


def test_out_of_band_box_is_all_gray():
    cfg = LabelCfg()
    box = np.array([[[100.0, 60.0, 140.0, 180.0]]])  # height 120 >> band
    out = rasterize_batch(jnp.asarray(box), jnp.ones((1, 1), bool), cfg)
    assert np.asarray(out["score"]).sum() == 0
    assert np.asarray(out["ignore"]).sum() > 0


def test_overlap_assigns_nearest_center():
    cfg = _small_cfg()
    # two in-band boxes whose positive discs overlap
    boxes = np.array([[[10., 10., 30., 30.], [22., 10., 42., 30.]]])
    out = rasterize_batch(jnp.asarray(boxes), jnp.ones((1, 2), bool), cfg)
    loc = np.asarray(out["loc"][0])
    score = np.asarray(out["score"][0, :, :, 0])
    # at box-0's center pixel the decoded box must be box 0
    cx0, cy0 = 5, 5  # (10+30)/2/4
    assert score[cy0, cx0] == 1.0
    d = loc[cy0, cx0] * cfg.loc_norm * cfg.stride
    np.testing.assert_allclose(
        [cx0 * 4 - d[0], cy0 * 4 - d[1], cx0 * 4 + d[2], cy0 * 4 + d[3]],
        boxes[0, 0], atol=1e-4)


def test_decode_rasterize_roundtrip():
    """decode(rasterize(box)) recovers the box exactly at every positive
    pixel (shared coordinate convention with ops/decode.py)."""
    cfg = _small_cfg()
    boxes, valid, _, _ = _rand_instances(3, b=1, k=1, cfg=cfg)
    valid[:] = True
    # force in-band height
    boxes[0, 0, 3] = boxes[0, 0, 1] + cfg.std_height_px
    out = rasterize_batch(jnp.asarray(boxes), jnp.asarray(valid), cfg)
    db, ds, dv = decode_topk(
        out["score"][0, :, :, 0], out["loc"][0],
        stride=cfg.stride, loc_norm=cfg.loc_norm, topk=16, score_thresh=0.5)
    n_pos = int(np.asarray(out["score"]).sum())
    assert n_pos > 0
    got = np.asarray(db)[np.asarray(dv)]
    for g in got:
        np.testing.assert_allclose(g, boxes[0, 0], atol=1e-3)


def test_empty_patch_all_background():
    cfg = _small_cfg()
    out = rasterize_batch(jnp.zeros((1, 4, 4)), jnp.zeros((1, 4), bool), cfg)
    for key in ("score", "ignore", "loc_mask"):
        assert np.asarray(out[key]).sum() == 0
