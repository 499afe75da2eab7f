"""Training step + state (SURVEY.md C9, §4.1; BASELINE config 4).

The reference's epoch loop crosses the host<->device boundary three times per
step (batch H2D, possible OHEM sync, checkpoint D2H) and rasterizes GT on CPU
workers (SURVEY.md §4.1). Here one jitted ``train_step(state, batch)`` does
GT rasterization, forward, OHEM loss, backward, and the SGD update entirely
on device; the batch carries raw patch pixels + padded box tensors only.

Optimizer: SGD momentum 0.9, weight decay 5e-4 (paper §3.4), staircase
exponential lr decay — all from TrainCfg.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from densebox_tpu.config import DenseBoxConfig
from densebox_tpu.ops.labels import rasterize
from densebox_tpu.ops.ohem import densebox_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    key: jax.Array


def mask_rng_key(key: jax.Array, impl: str) -> jax.Array:
    """Re-wrap a per-step key for the *bulk* random-bit draws (dropout
    masks, OHEM sampling noise).

    ``state.key`` stays threefry2x32 so the checkpoint key format and the
    fold_in/split stream structure never change; only the leaf keys that
    actually generate mask-sized bit tensors are re-wrapped. With
    impl='rbg' those draws lower to XLA RngBitGenerator (TPU hardware RNG)
    instead of ~118M-element fused threefry rounds — measured (round 3,
    fast w0.5/B128 train step): 58.2 -> 48.4 ms/step. 'auto' resolves to
    'rbg' on TPU and 'threefry' elsewhere, keeping CPU test goldens
    bit-identical to rounds 1-2.
    """
    if impl == "auto":
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry"
    if impl == "threefry":
        return key
    # threefry key data is 2x uint32; the rbg family wants 4. Tiling is an
    # arbitrary deterministic injection — any distinct seed word pair gives
    # an independent hardware-RNG stream.
    return jax.random.wrap_key_data(
        jnp.tile(jax.random.key_data(key), 2), impl=impl)


def make_optimizer(cfg: DenseBoxConfig) -> optax.GradientTransformation:
    tcfg = cfg.train
    schedule = optax.exponential_decay(
        init_value=tcfg.learning_rate,
        transition_steps=tcfg.lr_decay_steps,
        decay_rate=tcfg.lr_decay_rate,
        staircase=True)
    steps = []
    if tcfg.grad_clip_norm > 0:
        steps.append(optax.clip_by_global_norm(tcfg.grad_clip_norm))
    steps += [optax.add_decayed_weights(tcfg.weight_decay),
              optax.sgd(schedule, momentum=tcfg.momentum)]
    return optax.chain(*steps)


def create_train_state(model, cfg: DenseBoxConfig, sample_images) -> TrainState:
    key = jax.random.key(cfg.train.seed)
    k_init, k_state = jax.random.split(key)
    params = model.init(k_init, sample_images)
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, key=k_state)


def make_train_step(model, cfg: DenseBoxConfig):
    """Returns a pure train_step(state, batch) -> (state, metrics).

    batch dict (all device arrays):
      image:     (B, P, P, 3) float patches
      boxes:     (B, K, 4) xyxy patch coords (padded)
      box_valid: (B, K) bool
      landmarks: (B, K, L, 2), lm_valid: (B, K, L)   [optional]
    """
    tx = make_optimizer(cfg)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_key = jax.random.fold_in(state.key, state.step)
        k_drop, k_loss = jax.random.split(step_key)
        k_drop = mask_rng_key(k_drop, cfg.train.rng_impl)
        k_loss = mask_rng_key(k_loss, cfg.train.rng_impl)

        gts = rasterize(
            batch["boxes"], batch["box_valid"], cfg.label,
            batch.get("landmarks"), batch.get("lm_valid"),
            backend=cfg.train.label_backend)

        def loss_fn(params):
            out = model.apply(params, batch["image"], train=True,
                              rngs={"dropout": k_drop})
            return densebox_loss(out, gts, k_loss, cfg.loss)

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        # Divergence sentinel: a non-finite backward with a *finite* loss
        # would otherwise poison params invisibly until the next loss fetch;
        # the trainer checks this at every log/ckpt boundary before saving.
        metrics["update_norm"] = optax.global_norm(updates)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, metrics

    return train_step
