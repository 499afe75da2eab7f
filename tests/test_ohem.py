"""OHEM mask invariants (SURVEY.md §5.2): all positives kept, #neg == #pos,
half-hard/half-random under a fixed PRNG, gray zone never sampled,
determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from densebox_tpu.config import LossCfg
from densebox_tpu.ops.ohem import densebox_loss, ohem_mask


def _setup(seed=0, p=400, n_pos=40, n_ign=60):
    rng = np.random.RandomState(seed)
    pos = np.zeros(p, bool)
    pos[:n_pos] = True
    ign = np.zeros(p, bool)
    ign[n_pos:n_pos + n_ign] = True
    sq = rng.uniform(0.0, 1.0, p).astype(np.float32)
    return jnp.asarray(sq), jnp.asarray(pos), jnp.asarray(ign)


def test_mask_invariants():
    cfg = LossCfg()
    sq, pos, ign = _setup()
    mask = np.asarray(ohem_mask(sq, pos, ign, jax.random.key(0), cfg))
    npos = int(np.asarray(pos).sum())
    # all positives kept
    assert mask[np.asarray(pos)].all()
    # ignore never sampled
    assert not mask[np.asarray(ign)].any()
    # #neg == neg_pos_ratio * #pos
    n_neg = mask.sum() - npos
    assert n_neg == npos
    # the hard half are exactly the top-loss negatives
    neg_cand = ~np.asarray(pos) & ~np.asarray(ign)
    n_hard = int(cfg.hard_frac * n_neg)
    sqn = np.asarray(sq).copy()
    sqn[~neg_cand] = -np.inf
    hardest = np.argsort(-sqn)[:n_hard]
    assert mask[hardest].all()


def test_mask_deterministic_and_key_sensitive():
    cfg = LossCfg()
    sq, pos, ign = _setup(1)
    m1 = np.asarray(ohem_mask(sq, pos, ign, jax.random.key(7), cfg))
    m2 = np.asarray(ohem_mask(sq, pos, ign, jax.random.key(7), cfg))
    m3 = np.asarray(ohem_mask(sq, pos, ign, jax.random.key(8), cfg))
    assert (m1 == m2).all()
    assert (m1 != m3).any()  # random half actually random
    # but hard half + positives identical across keys
    assert m1.sum() == m3.sum()


def test_no_positive_patch_samples_min_neg():
    cfg = LossCfg(min_neg=16)
    sq, _, ign = _setup(2, n_pos=0, n_ign=0)
    pos = jnp.zeros(sq.shape[0], bool)
    mask = np.asarray(ohem_mask(sq, pos, jnp.zeros_like(pos), jax.random.key(0), cfg))
    assert mask.sum() == 16


def test_loss_decreases_toward_gt():
    """Loss at GT predictions << loss at wrong predictions."""
    cfg = LossCfg()
    b, m = 2, 16
    rng = np.random.RandomState(0)
    score_gt = (rng.rand(b, m, m, 1) > 0.9).astype(np.float32)
    loc_gt = rng.randn(b, m, m, 4).astype(np.float32) * score_gt
    gts = {"score": jnp.asarray(score_gt), "loc": jnp.asarray(loc_gt),
           "loc_mask": jnp.asarray(score_gt),
           "ignore": jnp.zeros((b, m, m, 1))}
    perfect = {"score": gts["score"], "loc": gts["loc"]}
    wrong = {"score": 1.0 - gts["score"], "loc": gts["loc"] + 2.0}
    l_good, met = densebox_loss(perfect, gts, jax.random.key(0), cfg)
    l_bad, _ = densebox_loss(wrong, gts, jax.random.key(0), cfg)
    assert float(l_good) < 1e-6
    assert float(l_bad) > 1.0
    assert met["n_pos"] == score_gt.sum()


def test_loss_jits_and_grads_finite():
    cfg = LossCfg()
    b, m = 2, 16
    key = jax.random.key(0)
    preds = {"score": jax.random.normal(key, (b, m, m, 1)),
             "loc": jax.random.normal(key, (b, m, m, 4)),
             "lm": jax.random.normal(key, (b, m, m, 3)),
             "refined": jax.random.normal(key, (b, m, m, 1))}
    gts = {"score": (jax.random.uniform(key, (b, m, m, 1)) > 0.9).astype(jnp.float32),
           "loc": jnp.zeros((b, m, m, 4)),
           "lm": jnp.zeros((b, m, m, 3)),
           "ignore": jnp.zeros((b, m, m, 1))}
    gts["loc_mask"] = gts["score"]

    def f(p):
        return densebox_loss(p, gts, jax.random.key(1), cfg)[0]

    g = jax.jit(jax.grad(f))(preds)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    # positives must receive cls gradient
    assert np.abs(np.asarray(g["score"])[np.asarray(gts["score"]) > 0]).min() > 0


def test_sort_threshold_mask_bit_equals_rank_twin():
    """ohem_mask (sort+threshold rewrite) is bit-identical to the original
    argsort-rank formulation across random cases engineered for ties
    (quantized losses, all-negative patches, zero-positive patches)."""
    from densebox_tpu.ops.ohem import ohem_mask, ohem_mask_rank

    cfg = LossCfg()
    p = 400
    for seed in range(8):
        k0, k1, k2, k3 = jax.random.split(jax.random.key(seed), 4)
        sq = jnp.round(jax.random.uniform(k0, (p,)) * 8) / 8  # forced ties
        pos = jax.random.uniform(k1, (p,)) < (0.0 if seed == 3 else 0.08)
        ign = (jax.random.uniform(k2, (p,)) < 0.1) & ~pos
        m_new = ohem_mask(sq, pos, ign, k3, cfg)
        m_old = ohem_mask_rank(sq, pos, ign, k3, cfg)
        np.testing.assert_array_equal(np.asarray(m_new), np.asarray(m_old),
                                      err_msg=f"seed {seed}")
