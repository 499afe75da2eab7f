"""Micro-bench: fused Pallas qconv vs the XLA int8 layer chain, plus the
full fused model vs XLA int8 model (s2d4 flagship shapes)."""
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
from densebox_tpu.ops.pallas.qconv import qconv_int8

B = 128
ITERS = 8


def timeit(name, fn, *args, iters=ITERS, per=None):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(i, *a)
            tot = jnp.float32(0.0)
            for v in jax.tree.leaves(out):
                tot += v.astype(jnp.float32).sum()
            return acc + tot
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    t0 = time.perf_counter(); float(loop(*args)); c = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    ms = 1e3 * best / (iters * (per or B))
    print(json.dumps({"name": name, "ms_per_image": round(ms, 4),
                      "compile_s": round(c, 1)}), flush=True)


# --- single conv3-shaped layer (128,120,160,128)->128, 3x3 ---------------
k = jax.random.key(0)
x8 = jax.random.randint(k, (B, 120, 160, 128), -127, 128, jnp.int8)
w8 = jax.random.randint(k, (3, 3, 128, 128), -20, 21, jnp.int8)
scale = jnp.full((128,), 1e-3, jnp.float32)
bias = jnp.zeros((128,), jnp.float32)
osc = jnp.full((128,), 30.0, jnp.float32)


def xla_layer(i, x, w):
    xq = (x + i.astype(jnp.int8)).astype(jnp.int8)
    y = _int8_conv(xq, w, pad=1).astype(jnp.float32)
    y = jax.nn.relu(y * scale + bias).astype(_GLUE)
    return {"q": _quant_act(y, 1.0 / 30.0)}


def pallas_layer(i, x, w):
    xq = (x + i.astype(jnp.int8)).astype(jnp.int8)
    return {"q": qconv_int8(xq, w, scale, bias, osc)}


timeit("xla_layer_conv3", xla_layer, x8, w8)
timeit("pallas_layer_conv3", pallas_layer, x8, w8)

# --- full model: fused vs xla (s2d4 flagship) -----------------------------
cfg = ModelCfg(width_mult=0.5, compute_dtype="bfloat16", stem="s2d4",
               trunk_depth=3)
model = DenseBox(cfg)
images = jax.random.uniform(jax.random.key(0), (B, 480, 640, 3), jnp.bfloat16)
params = model.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3), jnp.float32))
qparams = quantize_densebox(params, cfg, images[:2].astype(jnp.float32))
mx = QuantDenseBox(cfg, backend="xla")
mp = QuantDenseBox(cfg, backend="pallas")

timeit("xla_model_s2d4", lambda i, p, x: mx.apply(
    p, x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)), qparams, images)
timeit("pallas_model_s2d4", lambda i, p, x: mp.apply(
    p, x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)), qparams, images)
