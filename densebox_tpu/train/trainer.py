"""Training driver (SURVEY.md C9; BASELINE config 5 "full detection training
run, data-parallel batches over a TPU mesh").

One jitted mega-step = on-device patch sampling + GT rasterization + forward
+ OHEM loss + backward + SGD. The driver adds: data-parallel mesh placement,
periodic orbax checkpoints with exact resume, metric logging, optional
profiler capture. Host work is image IO only (data/pipeline.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from densebox_tpu.config import DenseBoxConfig
from densebox_tpu.data.patches import sample_patches
from densebox_tpu.models import DenseBox
from densebox_tpu.ops.labels import rasterize
from densebox_tpu.ops.ohem import densebox_loss
from densebox_tpu.train import checkpoint as ckpt_lib
from densebox_tpu.train import loop as loop_lib
from densebox_tpu.train.loop import (TrainState, create_train_state,
                                     make_optimizer)
from densebox_tpu.utils.logging import MetricsLogger


def make_canvas_train_step(model: DenseBox, cfg: DenseBoxConfig,
                           sample_from_canvas: bool = True) -> Callable:
    """Train step taking either raw canvas batches (full images + boxes;
    patches sampled on device) or pre-cropped patch batches."""
    tx = make_optimizer(cfg)

    def train_step(state: TrainState, batch: Dict[str, jax.Array]
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        step_key = jax.random.fold_in(state.key, state.step)
        k_patch, k_drop, k_loss = jax.random.split(step_key, 3)
        # Bulk-mask keys only; k_patch (a handful of crop offsets) stays
        # threefry. See loop.mask_rng_key for the measured policy.
        k_drop = loop_lib.mask_rng_key(k_drop, cfg.train.rng_impl)
        k_loss = loop_lib.mask_rng_key(k_loss, cfg.train.rng_impl)

        if sample_from_canvas:
            cd = cfg.train.crop_dtype
            if cd == "auto":
                cd = cfg.model.compute_dtype
            batch = sample_patches(
                k_patch, batch["image"], batch["boxes"], batch["box_valid"],
                cfg.label, landmarks=batch.get("landmarks"),
                lm_valid=batch.get("lm_valid"),
                crop_dtype=(jnp.bfloat16 if cd == "bfloat16" else None))

        gts = rasterize(
            batch["boxes"], batch["box_valid"], cfg.label,
            batch.get("landmarks"), batch.get("lm_valid"),
            backend=cfg.train.label_backend)

        def fwd(params, image):
            out = model.apply(params, image, train=True,
                              rngs={"dropout": k_drop})
            return densebox_loss(out, gts, k_loss, cfg.loss)

        remat = cfg.train.remat
        if remat == "auto":
            # measured policy (round-3 A/B, fast w0.5/B128/240px; numbers
            # in BASELINE.md train ladder)
            remat = "off"
        if remat == "on":
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            return fwd(params, batch["image"])

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        # See loop.py: catches finite-loss/non-finite-backward poisoning at
        # the next boundary, before any checkpoint write.
        metrics["update_norm"] = optax.global_norm(updates)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    return train_step


@dataclasses.dataclass
class FitResult:
    state: TrainState
    last_metrics: Dict[str, float]


class TrainingDiverged(RuntimeError):
    """Raised when the loss goes non-finite (SURVEY.md §6 failure-detection
    row). Explicit rather than jax_debug_nans-based: on async runtimes
    (e.g. this machine's axon tunnel) jax_debug_nans never fires, so the
    trainer checks the fetched loss at every log/checkpoint boundary and
    refuses to checkpoint a poisoned state — a later --max-restarts retry
    resumes from the last finite checkpoint."""


def fit(
    cfg: DenseBoxConfig,
    batches,
    workdir: Optional[str] = None,
    *,
    num_steps: Optional[int] = None,
    sample_from_canvas: bool = True,
    use_mesh: bool = True,
    resume: bool = True,
    init_state: Optional[TrainState] = None,
    run_salt: int = 0,
) -> FitResult:
    """Run the training loop.

    ``batches`` is either an iterator of canvas dicts, or a callable
    ``step -> batch`` (step-keyed streams make resume bit-exact, since the
    data consumed at step N is identical across interrupted and
    uninterrupted runs). Mesh DP engages automatically when more than one
    device is visible.

    ``run_salt`` (nonzero on --max-restarts retries) is folded into the
    training PRNG key after restore, so a retry draws fresh dropout/OHEM
    randomness instead of bit-exactly replaying a deterministic divergence.
    Salted resumes are intentionally NOT bit-exact vs an uninterrupted run.
    """
    model = DenseBox(cfg.model)
    num_steps = num_steps or cfg.train.num_steps
    fetch = batches if callable(batches) else (lambda _step: next(batches))

    first = fetch(0)
    state = init_state or create_train_state(model, cfg, first["image"][:1])

    # single-writer discipline (SURVEY.md §6): every process participates
    # in orbax saves (it coordinates multi-host internally), but console/
    # TensorBoard output comes from the primary only
    from densebox_tpu.parallel.multihost import is_primary

    primary = is_primary()
    mngr = logger = None
    if workdir:
        mngr = ckpt_lib.make_manager(f"{workdir}/ckpt", cfg.train.ckpt_keep)
        logger = MetricsLogger(f"{workdir}/tb") if primary else None
        if resume:
            restored = ckpt_lib.restore_checkpoint(mngr, state)
            if restored is not None:
                state = restored[0]
                if primary:
                    print(f"resumed from step {int(state.step)}", flush=True)
    if run_salt:
        state = state.replace(
            key=jax.random.fold_in(state.key, run_salt))

    raw_step = make_canvas_train_step(model, cfg, sample_from_canvas)

    place_batch = lambda b: b  # noqa: E731
    n_dev = len(jax.devices())
    # multi-host: `first` is this process's LOCAL batch; the global batch
    # (local * process_count) must divide over all devices
    global_batch = first["image"].shape[0] * jax.process_count()
    if use_mesh and n_dev > 1 and global_batch % n_dev:
        if primary:
            print(f"DP mesh disabled: global batch {global_batch} not "
                  f"divisible by {n_dev} devices", flush=True)
        use_mesh = False
    if use_mesh and n_dev > 1:
        from densebox_tpu.parallel import (batch_sharding, make_mesh,
                                           place_host_batch,
                                           place_host_state,
                                           state_shardings)
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(n_model=1)
        st_sh = state_shardings(state, mesh)
        b_sh = batch_sharding(mesh)
        step_fn = jax.jit(raw_step, in_shardings=(st_sh, b_sh),
                          out_shardings=(st_sh, NamedSharding(mesh, P())))
        state = place_host_state(state, st_sh)
        place_batch = lambda b: place_host_batch(b, b_sh)  # noqa: E731
    else:
        step_fn = jax.jit(raw_step)

    last: Dict[str, float] = {}
    # host-side step mirror: reading state.step from the device every
    # iteration would force a sync per step (~30 ms each on this TPU
    # tunnel); the counter increments deterministically so the host tracks
    # it and only metrics at boundaries touch the device.
    step = int(state.step)
    batch = first if step == 0 else fetch(step)
    while step < num_steps:
        state, metrics = step_fn(state, place_batch(batch))
        step += 1
        at_boundary = (step % cfg.train.log_every == 0
                       or step % cfg.train.ckpt_every == 0
                       or step == num_steps)
        if at_boundary:
            loss = float(metrics["loss_total"])
            upd = float(metrics.get("update_norm", 0.0))
            if not (np.isfinite(loss) and np.isfinite(upd)):
                raise TrainingDiverged(
                    f"non-finite loss {loss} / update norm {upd} "
                    f"at step {step}")
        if logger and (step % cfg.train.log_every == 0 or step == num_steps):
            last = logger.log(step, metrics)
        elif step == num_steps:
            last = {k: float(v) for k, v in metrics.items()}
        if mngr and (step % cfg.train.ckpt_every == 0 or step == num_steps):
            ckpt_lib.save_checkpoint(mngr, state, cfg)
        if step < num_steps:
            batch = fetch(step)
    if mngr:
        mngr.wait_until_finished()
    return FitResult(state=state, last_metrics=last)
