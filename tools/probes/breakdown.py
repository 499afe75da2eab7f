"""Component timing breakdown at the flagship bench config."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import time, json, sys
import jax, jax.numpy as jnp

from densebox_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from densebox_tpu.config import InferCfg, LabelCfg, ModelCfg
from densebox_tpu.infer import detect_batch
from densebox_tpu.models import DenseBox
from densebox_tpu.models.quant import QuantDenseBox, quantize_densebox
from densebox_tpu.ops.decode import decode_topk

B, H, W = 128, 480, 640
ITERS = 8
cfg = ModelCfg(width_mult=0.5, compute_dtype="bfloat16", stem="s2d", trunk_depth=3)
icfg = InferCfg(scales=(1.0,), score_thresh=0.5, topk_per_scale=256,
                max_dets=128, approx_topk=True)
lcfg = LabelCfg()

model = DenseBox(cfg)
dtype = jnp.bfloat16
images = jax.random.uniform(jax.random.key(0), (B, H, W, 3), dtype)
params = model.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3), jnp.float32))
qparams = quantize_densebox(params, cfg, images[:2].astype(jnp.float32))
qmodel = QuantDenseBox(cfg)


def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(i, *a)
            tot = jnp.float32(0.0)
            for v in jax.tree.leaves(out):
                vf = v.astype(jnp.float32)
                tot += jnp.where(jnp.isfinite(vf), vf, 0.0).sum()
            return acc + tot
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    t0 = time.perf_counter()
    float(loop(*args))
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    ms = 1e3 * best / (ITERS * B)
    print(json.dumps({"name": name, "ms_per_image": round(ms, 4),
                      "img_s": round(B * ITERS / best, 1),
                      "compile_s": round(comp, 1)}), flush=True)
    return ms


def perturb(x, i):
    return x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)

# 1. int8 forward only
timeit("int8_forward", lambda i, p, x: qmodel.apply(p, perturb(x, i)), qparams, images)

# 2. bf16 forward only
timeit("bf16_forward", lambda i, p, x: model.apply(p, perturb(x, i)), params, images)

# 3. int8 forward + decode (no NMS)
def fwd_decode(i, p, x):
    out = qmodel.apply(p, perturb(x, i))
    def dec(s, l):
        return decode_topk(s, l, stride=4, loc_norm=lcfg.loc_norm, topk=256,
                           score_thresh=0.5, approx=True)
    b, s, v = jax.vmap(dec)(out["score"], out["loc"])
    return {"b": b, "s": s, "v": v}
timeit("int8_fwd_decode", fwd_decode, qparams, images)

# 4. full pipeline (should match bench 0.388)
timeit("int8_full_pipeline",
       lambda i, p, x: detect_batch(qmodel, p, perturb(x, i), icfg, lcfg),
       qparams, images)
