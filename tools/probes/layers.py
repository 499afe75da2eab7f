"""Per-section timing of the int8 forward (s2d4 flagship candidate)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import time, json
import jax, jax.numpy as jnp

from densebox_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from densebox_tpu.config import ModelCfg
from densebox_tpu.models import DenseBox
from densebox_tpu.models.quant import (QuantDenseBox, quantize_densebox,
                                       _quant_act, _int8_conv, _GLUE)
from densebox_tpu.models.densebox import (space_to_depth, trunk_plan,
                                          upsample2x_align_corners)

B, H, W = 128, 480, 640
ITERS = 8
cfg = ModelCfg(width_mult=0.5, compute_dtype="bfloat16", stem="s2d4",
               trunk_depth=3)
model = DenseBox(cfg)
images = jax.random.uniform(jax.random.key(0), (B, H, W, 3), jnp.bfloat16)
params = model.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3), jnp.float32))
qparams = quantize_densebox(params, cfg, images[:2].astype(jnp.float32))

plan = trunk_plan(cfg)
f3_tap = [n for k, n, _ in plan if k == "conv" and n.startswith("conv3")][-1]


def conv(x, name, pad, relu=True):
    q = qparams[name]
    xq = _quant_act(x, q["in_scale"])
    y = _int8_conv(xq, q["w_q"], pad=pad).astype(jnp.float32)
    y = y * (q["in_scale"] * q["w_scale"]) + q["bias"]
    y = y.astype(_GLUE)
    return jax.nn.relu(y) if relu else y


def fwd(x, stop=None):
    x = x.astype(_GLUE)
    f3 = None
    for kind, name, _ in plan:
        if kind == "conv":
            x = conv(x, name, pad=1)
            if name == f3_tap:
                f3 = x
        elif kind == "s2d":
            x = space_to_depth(x, 2)
        elif kind == "s2d4":
            x = space_to_depth(x, 4)
        else:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        if name == stop:
            return {"x": x}
    if stop == "trunk":
        return {"x": x, "f3": f3}
    feat = jnp.concatenate([f3, upsample2x_align_corners(x)], axis=-1)
    if stop == "fuse":
        return {"feat": feat}

    def head(prefix):
        h = conv(feat, f"{prefix}/{prefix}_conv1", pad=0)
        return conv(h, f"{prefix}/{prefix}_conv2", pad=0, relu=False)

    return {"score": head("det"), "loc": head("loc")}


def timeit(name, stop):
    @jax.jit
    def loop(x):
        def body(i, acc):
            out = fwd(x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype), stop)
            tot = jnp.float32(0.0)
            for v in jax.tree.leaves(out):
                tot += v.astype(jnp.float32).sum()
            return acc + tot
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    t0 = time.perf_counter(); float(loop(images)); c = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(images))
        best = min(best, time.perf_counter() - t0)
    ms = 1e3 * best / (ITERS * B)
    print(json.dumps({"upto": name, "ms_per_image": round(ms, 4),
                      "compile_s": round(c, 1)}), flush=True)
    return ms


timeit("s2d4_stem", "s2d4")
timeit("conv1_2", "conv1_2")
timeit("conv2_2", "conv2_2")
timeit("conv3_3(f3)", "conv3_3")
timeit("conv4_3", "trunk")
timeit("fuse(up+concat)", "fuse")
timeit("heads(full)", None)
