"""Checkpoint / resume via orbax (SURVEY.md §6 "Checkpoint / resume").

The reference does ``torch.save(state_dict)`` per interval + manual
``load_state_dict`` resume. Here: async orbax saves of the full TrainState
{step, params, opt_state, PRNG key} plus the serialized DenseBoxConfig,
keep-last-N, exact resume (step counter and threaded key restored).

PRNG keys are extended-dtype arrays orbax can't serialize directly; they are
stored as raw key data and re-wrapped on restore.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from densebox_tpu.config import DenseBoxConfig
from densebox_tpu.train.loop import TrainState

_IMPL = "threefry2x32"  # fixed key impl so restore is env-independent


def make_manager(ckpt_dir: str, keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True, enable_async_checkpointing=True))


def save_checkpoint(mngr: ocp.CheckpointManager, state: TrainState,
                    cfg: DenseBoxConfig) -> None:
    raw = state.replace(key=jax.random.key_data(state.key))
    mngr.save(int(state.step), args=ocp.args.Composite(
        state=ocp.args.StandardSave(raw),
        config=ocp.args.JsonSave(cfg.to_dict())))


def restore_checkpoint(mngr: ocp.CheckpointManager, template: TrainState
                       ) -> Optional[Tuple[TrainState, DenseBoxConfig]]:
    """Restore the latest checkpoint, or None if the directory is empty.
    ``template`` supplies the pytree structure/shapes (a freshly created
    state)."""
    step = mngr.latest_step()
    if step is None:
        return None
    raw_template = template.replace(key=jax.random.key_data(template.key))
    restored = mngr.restore(step, args=ocp.args.Composite(
        state=ocp.args.StandardRestore(raw_template),
        config=ocp.args.JsonRestore()))
    state = restored["state"].replace(
        key=jax.random.wrap_key_data(restored["state"].key, impl=_IMPL))
    return state, DenseBoxConfig.from_dict(restored["config"])


def load_for_inference(ckpt_dir: str):
    """Restore (cfg, params) from the latest checkpoint for detect-time use,
    reconstructing the model purely from the stored config."""
    import jax.numpy as jnp

    from densebox_tpu.models import DenseBox
    from densebox_tpu.train.loop import create_train_state

    mngr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    step = mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    cfg = DenseBoxConfig.from_dict(
        mngr.restore(step, args=ocp.args.Composite(
            config=ocp.args.JsonRestore()))["config"])
    model = DenseBox(cfg.model)
    template = create_train_state(
        model, cfg, jnp.zeros((1, 64, 64, 3), jnp.float32))
    state, _ = restore_checkpoint(mngr, template)
    return cfg, state.params
