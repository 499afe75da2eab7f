"""Pallas kernels must match their pure-jax twins exactly (interpret mode on
CPU; the same kernels compile for TPU — exercised by bench/TPU runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from densebox_tpu.config import LabelCfg
from densebox_tpu.ops.labels import rasterize_batch
from densebox_tpu.ops.nms import nms
from densebox_tpu.ops.pallas import nms_pallas, rasterize_batch_pallas


def _small_cfg():
    return LabelCfg(patch_size=64, std_height_px=20.0)


def _rand_instances(seed, b=3, k=4, num_lm=0):
    rng = np.random.RandomState(seed)
    cfg = _small_cfg()
    ps = cfg.patch_size
    ctr = rng.uniform(8, ps - 8, (b, k, 2))
    hgt = rng.uniform(0.5 * cfg.std_height_px, 1.6 * cfg.std_height_px, (b, k))
    wid = hgt * rng.uniform(0.7, 1.3, (b, k))
    boxes = np.stack([ctr[..., 0] - wid / 2, ctr[..., 1] - hgt / 2,
                      ctr[..., 0] + wid / 2, ctr[..., 1] + hgt / 2],
                     -1).astype(np.float32)
    valid = rng.rand(b, k) > 0.25
    lms = lmv = None
    if num_lm:
        off = rng.uniform(-0.3, 0.3, (b, k, num_lm, 2))
        lms = (ctr[:, :, None, :] +
               off * np.stack([wid, hgt], -1)[:, :, None, :]).astype(np.float32)
        lmv = rng.rand(b, k, num_lm) > 0.2
    return boxes, valid, lms, lmv


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("num_lm", [0, 3])
def test_pallas_rasterizer_matches_jax(seed, num_lm):
    cfg = _small_cfg()
    boxes, valid, lms, lmv = _rand_instances(seed, num_lm=num_lm)
    args = (jnp.asarray(boxes), jnp.asarray(valid), cfg,
            None if lms is None else jnp.asarray(lms),
            None if lmv is None else jnp.asarray(lmv))
    want = rasterize_batch(*args)
    got = jax.jit(
        lambda b, v, l, lv: rasterize_batch_pallas(b, v, cfg, l, lv),
        static_argnames=())(args[0], args[1], args[3], args[4]) \
        if num_lm else jax.jit(
        lambda b, v: rasterize_batch_pallas(b, v, cfg))(args[0], args[1])
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want[key]), atol=1e-5,
            err_msg=f"pallas rasterizer '{key}' diverged (seed={seed})")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_nms_matches_jax(seed):
    rng = np.random.RandomState(seed)
    n = 64
    ctr = rng.uniform(20, 200, (n, 2))
    wh = rng.uniform(10, 60, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    valid = rng.rand(n) > 0.2

    want = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
               iou_thresh=0.5, max_out=n)
    got = jax.jit(lambda b, s, v: nms_pallas(
        b, s, v, iou_thresh=0.5, max_out=n))(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    for a, b_, name in zip(got, want, ("boxes", "scores", "valid")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6,
                                   err_msg=f"pallas nms '{name}' diverged")


def test_pallas_nms_empty_input():
    boxes = jnp.zeros((16, 4))
    scores = jnp.zeros((16,))
    valid = jnp.zeros((16,), bool)
    _, _, v = nms_pallas(boxes, scores, valid, iou_thresh=0.5, max_out=8)
    assert not np.asarray(v).any()


def test_pallas_ohem_invariants():
    """The bisection OHEM kernel preserves every jax-twin invariant: all
    positives kept, #neg == #pos, hardest half identical, gray zone never
    sampled, deterministic per key."""
    from densebox_tpu.config import LossCfg
    from densebox_tpu.ops.pallas.ohem import ohem_mask_pallas

    cfg = LossCfg()
    rng = np.random.RandomState(0)
    b, p = 3, 400
    n_pos, n_ign = 40, 60
    pos = np.zeros((b, p), bool)
    pos[:, :n_pos] = True
    ign = np.zeros((b, p), bool)
    ign[:, n_pos:n_pos + n_ign] = True
    sq = rng.uniform(0.0, 1.0, (b, p)).astype(np.float32)

    m = np.asarray(ohem_mask_pallas(jnp.asarray(sq), jnp.asarray(pos),
                                    jnp.asarray(ign), jax.random.key(3), cfg))
    m2 = np.asarray(ohem_mask_pallas(jnp.asarray(sq), jnp.asarray(pos),
                                     jnp.asarray(ign), jax.random.key(3), cfg))
    np.testing.assert_array_equal(m, m2)  # deterministic per key

    # bit-identical to the jax argsort twin (same key stream, distinct vals)
    from densebox_tpu.ops.ohem import ohem_mask

    keys = jax.random.split(jax.random.key(3), b)
    twin = np.stack([np.asarray(ohem_mask(
        jnp.asarray(sq[i]), jnp.asarray(pos[i]), jnp.asarray(ign[i]),
        keys[i], cfg)) for i in range(b)])
    np.testing.assert_array_equal(m, twin)
    for i in range(b):
        assert m[i, pos[i]].all()                       # all positives kept
        assert not m[i, ign[i]].any()                   # gray never sampled
        n_neg = m[i].sum() - n_pos
        assert n_neg == n_pos                           # 1:1 neg:pos
        neg_cand = ~pos[i] & ~ign[i]
        n_hard = int(cfg.hard_frac * n_neg)
        s = sq[i].copy()
        s[~neg_cand] = -np.inf
        hardest = np.argsort(-s)[:n_hard]
        assert m[i, hardest].all()                      # hard half exact


def test_pallas_ohem_tied_losses_full_count():
    """Tied loss values at the cutoff (ubiquitous early in training) must not
    shrink the hard-negative count: the shortfall is filled from the tie
    class. Here ALL negatives share one loss value, the worst case."""
    from densebox_tpu.config import LossCfg
    from densebox_tpu.ops.pallas.ohem import ohem_mask_pallas

    cfg = LossCfg()
    b, p, n_pos = 2, 256, 32
    pos = np.zeros((b, p), bool)
    pos[:, :n_pos] = True
    ign = np.zeros((b, p), bool)
    sq = np.full((b, p), 0.25, np.float32)  # every negative ties

    m = np.asarray(ohem_mask_pallas(jnp.asarray(sq), jnp.asarray(pos),
                                    jnp.asarray(ign), jax.random.key(7), cfg))
    for i in range(b):
        assert m[i, pos[i]].all()
        assert m[i].sum() - n_pos == n_pos  # full 1:1 quota despite ties


def test_pallas_ohem_backend_trains():
    """densebox_loss(backend='pallas') must work under value_and_grad —
    pallas_call has no autodiff rule, so the mask path severs gradients
    (the mask is selection, not value; same semantics as the jax twin)."""
    from densebox_tpu.config import LossCfg
    from densebox_tpu.ops.ohem import densebox_loss

    rng = np.random.RandomState(0)
    m = 16
    gts = {
        "score": jnp.asarray((rng.rand(2, m, m, 1) > 0.9).astype(np.float32)),
        "ignore": jnp.zeros((2, m, m, 1), jnp.float32),
        "loc": jnp.asarray(rng.rand(2, m, m, 4).astype(np.float32)),
        "loc_mask": jnp.asarray(
            (rng.rand(2, m, m, 1) > 0.8).astype(np.float32)),
    }
    w = jnp.asarray(rng.randn(5).astype(np.float32))

    def loss_fn(w, backend):
        outputs = {"score": w[0] * jnp.ones((2, m, m, 1)) + w[1],
                   "loc": w[2] * jnp.ones((2, m, m, 4)) + w[3]}
        total, _ = densebox_loss(outputs, gts, jax.random.key(0),
                                 LossCfg(backend=backend))
        return total

    vp, gp = jax.value_and_grad(lambda w: loss_fn(w, "pallas"))(w)
    vj, gj = jax.value_and_grad(lambda w: loss_fn(w, "jax"))(w)
    assert np.isfinite(np.asarray(gp)).all()
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vj), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gj), rtol=1e-5)


def test_pallas_ohem_no_positive_patch():
    from densebox_tpu.config import LossCfg
    from densebox_tpu.ops.pallas.ohem import ohem_mask_pallas

    cfg = LossCfg(min_neg=16)
    sq = jnp.asarray(np.random.RandomState(1).rand(2, 300).astype(np.float32))
    pos = jnp.zeros((2, 300), bool)
    ign = jnp.zeros((2, 300), bool)
    m = np.asarray(ohem_mask_pallas(sq, pos, ign, jax.random.key(0), cfg))
    assert (m.sum(axis=1) == 16).all()


def test_qconv_fused_matches_reference():
    """Fused int8 conv+requant kernel == jnp reference (int32 accumulation,
    identical round/clip), across 3x3/1x1, aligned/unaligned widths, and
    both output modes (int8 requant / f32)."""
    from densebox_tpu.ops.pallas.qconv import qconv_int8, qconv_reference

    rng = np.random.RandomState(0)
    cases = [
        (2, 16, 24, 8, 16, 3, True),    # 3x3, unaligned W, int8 out
        (1, 8, 80, 16, 32, 3, False),   # 3x3, W%32!=0, f32 out
        (2, 16, 33, 8, 16, 1, True),    # 1x1, odd W
        (2, 12, 40, 8, 8, 3, True),     # TH does not divide evenly
    ]
    for b, h, w_, cin, cout, k, quant in cases:
        x = jnp.asarray(rng.randint(-127, 128, (b, h, w_, cin)), jnp.int8)
        w = jnp.asarray(rng.randint(-20, 21, (k, k, cin, cout)), jnp.int8)
        scale = jnp.asarray(rng.uniform(1e-3, 2e-3, (cout,)), jnp.float32)
        bias = jnp.asarray(rng.uniform(-0.1, 0.1, (cout,)), jnp.float32)
        osc = (jnp.asarray(rng.uniform(20, 40, (cout,)), jnp.float32)
               if quant else None)
        got = qconv_int8(x, w, scale, bias, osc)
        want = qconv_reference(x, w, scale, bias, osc)
        assert got.dtype == (jnp.int8 if quant else jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=1e-4, err_msg=str((b, h, w_, cin, cout, k, quant)))
