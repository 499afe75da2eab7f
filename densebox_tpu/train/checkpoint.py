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


_QUANT_MARKER = "quantized.json"


def save_quantized(ckpt_dir: str, qparams, cfg: DenseBoxConfig,
                   calibration: str = "") -> None:
    """Export an int8-PTQ checkpoint (the ``cli quantize`` deployment
    artifact): qparams pytree + serialized config + a marker recording the
    calibration source, so detect/eval/serve load it directly instead of
    recalibrating per run."""
    import json as _json
    import shutil

    # re-exporting over an existing artifact is the expected workflow
    # (retrain -> refresh); orbax raises StepAlreadyExistsError on a
    # repeated step, so clear a previous EXPORT (marker-verified — never
    # a training run) first
    if is_quantized_dir(ckpt_dir):
        shutil.rmtree(ckpt_dir)
    mngr = ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=1, create=True, enable_async_checkpointing=False))
    mngr.save(0, args=ocp.args.Composite(
        qparams=ocp.args.StandardSave(qparams),
        config=ocp.args.JsonSave(cfg.to_dict())))
    mngr.wait_until_finished()
    with open(os.path.join(ckpt_dir, _QUANT_MARKER), "w") as f:
        _json.dump({"format": 1, "calibration": calibration}, f)


def is_quantized_dir(ckpt_dir: str) -> bool:
    return os.path.exists(os.path.join(ckpt_dir, _QUANT_MARKER))


def load_quantized(ckpt_dir: str):
    """Restore (cfg, qparams, calibration_info) from a ``save_quantized``
    export."""
    import json as _json

    mngr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    step = mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    restored = mngr.restore(step, args=ocp.args.Composite(
        qparams=ocp.args.StandardRestore(),
        config=ocp.args.JsonRestore()))
    with open(os.path.join(ckpt_dir, _QUANT_MARKER)) as f:
        meta = _json.load(f)
    return (DenseBoxConfig.from_dict(restored["config"]),
            restored["qparams"], meta.get("calibration", ""))


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
