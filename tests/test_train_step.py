"""BASELINE config 4: single jitted training step — on-device GT generation +
OHEM loss + backward; loss decreases on a synthetic set (SURVEY.md §5.3)."""

import pytest

import dataclasses

import jax
import numpy as np

from densebox_tpu.config import DenseBoxConfig, LabelCfg, ModelCfg, TrainCfg
from densebox_tpu.data import synthetic_batch
from densebox_tpu.train import create_train_state, make_train_step


def _cfg(landmarks=0, refine=False):
    return DenseBoxConfig(
        model=ModelCfg(num_landmarks=landmarks, use_refine=refine,
                       width_mult=0.125),
        label=LabelCfg(patch_size=64, std_height_px=20.0),
        train=TrainCfg(batch_size=4, learning_rate=3e-3, max_boxes=3),
    )


@pytest.mark.slow
def test_config4_single_train_step():
    from densebox_tpu.models import DenseBox

    cfg = _cfg()
    model = DenseBox(cfg.model)
    batch = synthetic_batch(jax.random.key(0), 4, cfg.label, max_boxes=3)
    state = create_train_state(model, cfg, batch["image"])
    step = jax.jit(make_train_step(model, cfg))
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss_total"]))
    assert float(metrics["n_pos"]) > 0
    for leaf in jax.tree.leaves(new_state.params):
        assert np.isfinite(np.asarray(leaf)).all()
    # params actually moved
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.params, new_state.params)
    assert max(jax.tree.leaves(moved)) > 0


@pytest.mark.slow
def test_config4_loss_decreases_over_50_steps():
    from densebox_tpu.models import DenseBox

    cfg = _cfg(landmarks=4, refine=True)
    model = DenseBox(cfg.model)
    batch0 = synthetic_batch(jax.random.key(0), 4, cfg.label, max_boxes=3,
                             num_landmarks=4)
    state = create_train_state(model, cfg, batch0["image"])
    step = jax.jit(make_train_step(model, cfg))
    losses = []
    for i in range(50):
        batch = synthetic_batch(jax.random.key(i), 4, cfg.label, max_boxes=3,
                                num_landmarks=4)
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss_total"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < 0.6 * np.mean(losses[:10]), losses


@pytest.mark.slow
def test_train_step_deterministic():
    from densebox_tpu.models import DenseBox

    cfg = _cfg()
    model = DenseBox(cfg.model)
    batch = synthetic_batch(jax.random.key(0), 4, cfg.label, max_boxes=3)
    step = jax.jit(make_train_step(model, cfg))
    s1 = create_train_state(model, cfg, batch["image"])
    s2 = create_train_state(model, cfg, batch["image"])
    o1, m1 = step(s1, batch)
    o2, m2 = step(s2, batch)
    assert float(m1["loss_total"]) == float(m2["loss_total"])
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        o1.params, o2.params)
    assert max(jax.tree.leaves(diffs)) == 0.0


def test_mask_rng_key_policy():
    """rng_impl='threefry' is the identity; 'rbg' yields a usable 4-word
    hardware-RNG key that is deterministic in the source key; 'auto' off-TPU
    resolves to threefry (so CPU goldens from rounds 1-2 are unchanged)."""
    from densebox_tpu.train.loop import mask_rng_key

    k = jax.random.key(7)
    assert mask_rng_key(k, "threefry") is k
    # auto on this (CPU) test backend must be the identity too
    assert mask_rng_key(k, "auto") is k
    r = mask_rng_key(k, "rbg")
    assert jax.random.key_data(r).shape[-1] == 4
    # deterministic derivation + a working draw
    r2 = mask_rng_key(jax.random.key(7), "rbg")
    a = jax.random.bernoulli(r, 0.5, (64,))
    b = jax.random.bernoulli(r2, 0.5, (64,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # distinct source keys give distinct streams
    r3 = mask_rng_key(jax.random.key(8), "rbg")
    c = jax.random.bernoulli(r3, 0.5, (64,))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.slow
def test_train_step_runs_with_rbg_impl():
    """A full train step under rng_impl='rbg' (the TPU auto winner) is
    finite and deterministic on any backend."""
    from densebox_tpu.models import DenseBox

    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, rng_impl="rbg"))
    model = DenseBox(cfg.model)
    batch = synthetic_batch(jax.random.key(0), 4, cfg.label, max_boxes=3)
    step = jax.jit(make_train_step(model, cfg))
    s1 = create_train_state(model, cfg, batch["image"])
    s2 = create_train_state(model, cfg, batch["image"])
    o1, m1 = step(s1, batch)
    o2, m2 = step(s2, batch)
    assert np.isfinite(float(m1["loss_total"]))
    assert float(m1["loss_total"]) == float(m2["loss_total"])
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        o1.params, o2.params)
    assert max(jax.tree.leaves(diffs)) == 0.0


def test_optimizer_clips_exploding_gradients():
    """Production-scale guard: the initial multi-task L2 loss is large, and
    unclipped SGD NaN'd within 5 steps at lr 3e-3 (found on TPU). The
    optimizer must clip the global grad norm."""
    import optax

    from densebox_tpu.train import make_optimizer

    cfg = _cfg()
    assert cfg.train.grad_clip_norm > 0
    tx = make_optimizer(cfg)
    params = {"w": np.ones((4,), np.float32)}
    opt_state = tx.init(params)
    huge = {"w": np.full((4,), 1e9, np.float32)}
    updates, _ = tx.update(huge, opt_state, params)
    # step size bounded by lr * clip_norm (+ tiny wd term)
    assert np.abs(np.asarray(updates["w"])).max() <= (
        cfg.train.learning_rate * cfg.train.grad_clip_norm + 1e-2)

    cfg0 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_clip_norm=0.0))
    tx0 = make_optimizer(cfg0)
    updates0, _ = tx0.update(huge, tx0.init(params), params)
    assert np.abs(np.asarray(updates0["w"])).max() > 1e3  # unclipped
