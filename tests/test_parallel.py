"""BASELINE config 5 correctness (SURVEY.md §5.4): the 8-fake-device DP train
step produces the SAME parameters as the single-device step on the same
global batch, and TP sharding compiles + matches too."""

import jax
import numpy as np
import pytest

from densebox_tpu.config import DenseBoxConfig, LabelCfg, ModelCfg, TrainCfg
from densebox_tpu.data import synthetic_batch
from densebox_tpu.models import DenseBox
from densebox_tpu.parallel import make_mesh, make_sharded_train_step
from densebox_tpu.train import create_train_state, make_train_step


def _setup(batch=8):
    cfg = DenseBoxConfig(
        model=ModelCfg(width_mult=0.125),
        label=LabelCfg(patch_size=64, std_height_px=20.0),
        train=TrainCfg(batch_size=batch, learning_rate=1e-2, max_boxes=3))
    model = DenseBox(cfg.model)
    b = synthetic_batch(jax.random.key(0), batch, cfg.label, max_boxes=3)
    state = create_train_state(model, cfg, b["image"][:1])
    return cfg, model, b, state


def _max_diff(a, b):
    return max(jax.tree.leaves(jax.tree.map(
        lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()),
        a, b)))


def test_multihost_env_resolution(monkeypatch):
    """ensure_distributed() resolves explicit args > env vars and passes them
    to jax.distributed.initialize exactly once (SURVEY.md §3.3 multi-host
    row; only the bootstrap's host-side logic is testable on one machine)."""
    from densebox_tpu.parallel import multihost

    calls = []
    monkeypatch.setattr(multihost.jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.setattr(multihost, "_backends_initialized", lambda: False)
    monkeypatch.setattr(multihost, "_initialized", False)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "envhost:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")

    multihost.ensure_distributed()
    assert calls == [{"coordinator_address": "envhost:1234",
                      "num_processes": 4, "process_id": 2}]
    multihost.ensure_distributed()  # idempotent: no second initialize
    assert len(calls) == 1

    # explicit args beat env vars
    monkeypatch.setattr(multihost, "_initialized", False)
    multihost.ensure_distributed(coordinator_address="arg:1", process_id=0)
    assert calls[1]["coordinator_address"] == "arg:1"
    assert calls[1]["process_id"] == 0
    assert calls[1]["num_processes"] == 4  # env fills the gap


def test_multihost_noop_and_late_init(monkeypatch):
    from densebox_tpu.parallel import multihost

    calls = []
    monkeypatch.setattr(multihost.jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.setattr(multihost, "_initialized", False)
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "JAX_AUTO_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)

    multihost.ensure_distributed()  # nothing configured -> single-process
    assert calls == []

    # configured but a backend already exists -> loud, actionable failure
    # (the real initialize() would raise anyway; we fail before touching it)
    monkeypatch.setattr(multihost, "_backends_initialized", lambda: True)
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    with pytest.raises(RuntimeError, match="before any jax API"):
        multihost.ensure_distributed()
    assert calls == []


@pytest.mark.slow
def test_dp_matches_single_device():
    cfg, model, batch, state = _setup()

    single = jax.jit(make_train_step(model, cfg))
    s_ref, m_ref = single(state, batch)

    mesh = make_mesh()  # 8 fake CPU devices x 1 model
    assert mesh.shape == {"data": 8, "model": 1}
    step, place_state, place_batch = make_sharded_train_step(
        model, cfg, mesh, state)
    s_dp, m_dp = step(place_state(state), place_batch(batch))

    assert _max_diff(s_ref.params, s_dp.params) < 2e-6
    assert abs(float(m_ref["loss_total"]) - float(m_dp["loss_total"])) < 1e-5


def test_dp_multi_step_stays_in_sync():
    cfg, model, batch, state = _setup()
    mesh = make_mesh()
    step, place_state, place_batch = make_sharded_train_step(
        model, cfg, mesh, state)
    s = place_state(state)
    for i in range(3):
        b = place_batch(
            synthetic_batch(jax.random.key(i), 8, cfg.label, max_boxes=3))
        s, m = step(s, b)
        assert np.isfinite(float(m["loss_total"]))
    assert int(s.step) == 3
    # params remain fully replicated (addressable shards identical)
    leaf = jax.tree.leaves(s.params)[0]
    shards = [np.asarray(sh.data) for sh in leaf.addressable_shards]
    for sh in shards[1:]:
        np.testing.assert_array_equal(shards[0], sh)


@pytest.mark.slow
def test_tensor_parallel_2d_mesh_matches():
    cfg, model, batch, state = _setup(batch=4)
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}

    single = jax.jit(make_train_step(model, cfg))
    s_ref, _ = single(state, batch)

    step, place_state, place_batch = make_sharded_train_step(
        model, cfg, mesh, state, tensor_parallel=True)
    s_tp, _ = step(place_state(state), place_batch(batch))
    assert _max_diff(s_ref.params, s_tp.params) < 2e-6


def test_uneven_batch_rejected():
    cfg, model, batch, state = _setup(batch=6)  # 6 % 8 != 0
    mesh = make_mesh()
    step, place_state, place_batch = make_sharded_train_step(
        model, cfg, mesh, state)
    with pytest.raises(ValueError):
        place_batch(batch)


def test_prefetch_loader_shards_partition_global_batch(tmp_path):
    """Per-process loader shards (identical seed) partition exactly the
    global batch a single loader would draw — the multi-host data-path
    contract (round-2 verdict missing #3)."""
    import cv2

    from densebox_tpu.data.kitti import Sample
    from densebox_tpu.data.pipeline import PrefetchLoader

    samples = []
    for i in range(8):
        p = str(tmp_path / f"{i}.png")
        cv2.imwrite(p, np.full((16, 16, 3), 10 * i, np.uint8))
        samples.append(Sample(image_path=p,
                              boxes=np.array([[1., 1., 9., 9.]],
                                             np.float32)))

    def first_batch(**kw):
        loader = PrefetchLoader(samples, batch_size=4, canvas_hw=(16, 16),
                                max_boxes=1, seed=7, **kw)
        it = iter(loader)
        b = next(it)
        it.close()
        return {k: np.asarray(v) for k, v in b.items()}

    full = first_batch()
    s0 = first_batch(num_shards=2, shard_index=0)
    s1 = first_batch(num_shards=2, shard_index=1)
    np.testing.assert_array_equal(
        np.concatenate([s0["image"], s1["image"]]), full["image"])
    np.testing.assert_array_equal(
        np.concatenate([s0["boxes"], s1["boxes"]]), full["boxes"])

    with pytest.raises(ValueError, match="not divisible"):
        PrefetchLoader(samples, batch_size=5, canvas_hw=(16, 16),
                       max_boxes=1, num_shards=2)


def test_place_host_batch_dispatch(monkeypatch):
    """Single-process place_host_batch is a sharded device_put; with
    process_count > 1 it must route through
    jax.make_array_from_process_local_data (host-local numpy cannot be
    device_put onto non-addressable shardings)."""
    from densebox_tpu.parallel import mesh as mesh_lib

    mesh = make_mesh()
    b_sh = mesh_lib.batch_sharding(mesh)
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}

    placed = mesh_lib.place_host_batch(batch, b_sh)
    np.testing.assert_array_equal(np.asarray(placed["x"]), batch["x"])
    assert placed["x"].sharding == b_sh

    calls = []
    real = jax.make_array_from_process_local_data
    monkeypatch.setattr(mesh_lib.jax, "process_count", lambda: 2)
    monkeypatch.setattr(
        mesh_lib.jax, "make_array_from_process_local_data",
        lambda sh, v: calls.append(sh) or real(sh, v))
    mesh_lib.place_host_batch(batch, b_sh)
    assert calls == [b_sh]


def test_fit_single_writer_logging(tmp_path, capsys, monkeypatch):
    """Non-primary processes keep checkpointing (orbax coordinates all
    hosts) but write no console/TensorBoard output (round-2 verdict:
    is_primary() was dead code)."""
    import os

    from densebox_tpu.config import DenseBoxConfig
    from densebox_tpu.data import synthetic_batch
    from densebox_tpu.parallel import multihost
    from densebox_tpu.train import fit

    monkeypatch.setattr(multihost, "is_primary", lambda: False)
    cfg = DenseBoxConfig(
        model=ModelCfg(width_mult=0.125),
        label=LabelCfg(patch_size=64, std_height_px=20.0),
        train=TrainCfg(batch_size=8, num_steps=2, max_boxes=3,
                       ckpt_every=2, log_every=1))
    canvas = LabelCfg(patch_size=128, std_height_px=20.0)
    fetch = lambda step: synthetic_batch(  # noqa: E731
        jax.random.key(step), 8, canvas, max_boxes=3)
    result = fit(cfg, fetch, workdir=str(tmp_path), num_steps=2)
    out = capsys.readouterr().out
    assert "[train step" not in out
    assert np.isfinite(result.last_metrics["loss_total"])
    assert "2" in os.listdir(tmp_path / "ckpt")


def test_place_host_state_prng_key_leaf(monkeypatch):
    """Multi-process place_host_state must not crash on typed PRNG key
    leaves (TrainState.key): np.asarray on an extended-dtype key array
    raises TypeError, so key leaves unwrap via key_data and re-wrap with
    the same impl (round-3 advice, medium)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from densebox_tpu.parallel import mesh as mesh_lib

    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    key = jax.random.key(7)
    state = {"key": key, "step": np.int32(3)}
    shardings = {"key": repl, "step": repl}

    monkeypatch.setattr(mesh_lib.jax, "process_count", lambda: 2)
    placed = mesh_lib.place_host_state(state, shardings)
    assert jax.dtypes.issubdtype(placed["key"].dtype, jax.dtypes.prng_key)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(placed["key"])),
        np.asarray(jax.random.key_data(key)))
    # the impl survives the round-trip: identical fold_in/split streams
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(jax.random.fold_in(placed["key"], 5))),
        np.asarray(jax.random.key_data(jax.random.fold_in(key, 5))))
    assert int(placed["step"]) == 3
