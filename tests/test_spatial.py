"""Spatial (halo-exchange) sharding must be numerically IDENTICAL to the
single-device forward — it is a resharding of the same math, not an
approximation (SURVEY.md §3.3 SP row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from densebox_tpu.config import ModelCfg
from densebox_tpu.models import DenseBox
from densebox_tpu.parallel.mesh import make_mesh
from densebox_tpu.parallel.spatial import spatial_forward


@pytest.mark.slow
@pytest.mark.parametrize("landmarks,refine", [(0, False), (3, True)])
def test_spatial_matches_single_device(landmarks, refine):
    cfg = ModelCfg(num_landmarks=landmarks, use_refine=refine,
                   width_mult=0.125)
    model = DenseBox(cfg)
    # H=128 over 4 shards -> 32 rows/shard (divisible by 8)
    x = jax.random.uniform(jax.random.key(0), (2, 128, 64, 3), jnp.float32)
    params = model.init(jax.random.key(1), x[:1, :64, :64])

    want = model.apply(params, x)
    mesh = make_mesh(n_data=4, n_model=2)  # shard H over 4, ignore model axis
    got = spatial_forward(params, x, cfg, mesh, axis_name="data")

    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=2e-5,
            err_msg=f"spatially sharded head '{k}' diverged")


@pytest.mark.slow
def test_spatial_s2d_stem():
    cfg = ModelCfg(stem="s2d", trunk_depth=3, width_mult=0.125)
    model = DenseBox(cfg)
    x = jax.random.uniform(jax.random.key(2), (1, 128, 64, 3), jnp.float32)
    params = model.init(jax.random.key(3), x)
    want = model.apply(params, x)
    mesh = make_mesh(n_data=8, n_model=1)
    got = spatial_forward(params, x, cfg, mesh, axis_name="data")
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=2e-5)


def test_spatial_s2d4_stem():
    """Halo-exchange spatial sharding must also be exact for the
    bandwidth-lean s2d4 stem (whole trunk at the output stride)."""
    cfg = ModelCfg(stem="s2d4", trunk_depth=3, width_mult=0.125)
    model = DenseBox(cfg)
    x = jax.random.uniform(jax.random.key(4), (1, 128, 64, 3), jnp.float32)
    params = model.init(jax.random.key(5), x)
    want = model.apply(params, x)
    mesh = make_mesh(n_data=8, n_model=1)
    got = spatial_forward(params, x, cfg, mesh, axis_name="data")
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=2e-5)


def test_spatial_rejects_bad_height():
    cfg = ModelCfg(width_mult=0.125)
    model = DenseBox(cfg)
    x = jnp.zeros((1, 72, 64, 3))
    params = model.init(jax.random.key(0), x[:, :64])
    mesh = make_mesh(n_data=8, n_model=1)
    with pytest.raises(ValueError):
        spatial_forward(params, x, cfg, mesh, axis_name="data")


@pytest.mark.slow
def test_spatial_detect_end_to_end():
    """SpatialDenseBox drives the standard detect pipeline: trunk H-sharded
    over the mesh, decode+NMS on the gathered maps — same detections as the
    unsharded model."""
    from densebox_tpu.config import InferCfg, LabelCfg
    from densebox_tpu.infer import detect_batch
    from densebox_tpu.parallel.spatial import SpatialDenseBox

    cfg = ModelCfg(width_mult=0.125)
    model = DenseBox(cfg)
    x = jax.random.uniform(jax.random.key(5), (1, 256, 64, 3), jnp.float32)
    params = model.init(jax.random.key(6), x[:, :64])
    mesh = make_mesh(n_data=8, n_model=1)
    icfg = InferCfg(scales=(1.0,), score_thresh=-1e9, topk_per_scale=32,
                    max_dets=8)

    want = jax.jit(lambda p, im: detect_batch(model, p, im, icfg,
                                              LabelCfg()))(params, x)
    smodel = SpatialDenseBox(cfg, mesh)
    got = detect_batch(smodel, params, x, icfg, LabelCfg())
    np.testing.assert_array_equal(np.asarray(got["valid"]),
                                  np.asarray(want["valid"]))
    np.testing.assert_allclose(np.asarray(got["boxes"]),
                               np.asarray(want["boxes"]), atol=1e-3)
