"""Capture a jax.profiler trace of the turbo pipeline and summarize the
top device ops (ROADMAP #1: profile-driven next lever). Writes the raw
trace under /tmp/densebox_profile and prints an aggregated table parsed
from the trace.json.gz event stream."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from densebox_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from densebox_tpu.config import InferCfg, LabelCfg, ModelCfg
from densebox_tpu.infer import detect_batch
from densebox_tpu.models import DenseBox
from densebox_tpu.models.quant import QuantDenseBox, quantize_densebox

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("--landmarks", type=int, default=0)
_ap.add_argument("--batch", type=int, default=256)
_ap.add_argument("--scales", default="1.0",
                 help="comma-separated pyramid scales (4-scale residual "
                      "probe: 0.5,0.71,1.0,1.41)")
_args = _ap.parse_args()

B, H, W = _args.batch, 480, 640
cfg = ModelCfg(width_mult=0.25, compute_dtype="bfloat16", stem="s2d4",
               trunk_depth=3, num_landmarks=_args.landmarks,
               use_refine=_args.landmarks > 0)
icfg = InferCfg(scales=tuple(float(s) for s in _args.scales.split(",")),
                score_thresh=0.5, topk_per_scale=256,
                max_dets=128, approx_topk=True)
lcfg = LabelCfg()
model = DenseBox(cfg)
images = jax.random.uniform(jax.random.key(0), (B, H, W, 3), jnp.bfloat16)
params = model.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3), jnp.float32))
qparams = quantize_densebox(params, cfg, images[:2].astype(jnp.float32))
qmodel = QuantDenseBox(cfg)


@jax.jit
def pipeline(p, x):
    out = detect_batch(qmodel, p, x, icfg, lcfg)
    return sum(v.astype(jnp.float32).sum() for v in out.values())


# compile-bomb guard (BASELINE.md packed-dropout entry): compile a tiny
# shape FIRST so a pathological full-shape compile is never the first
# signal the remote compiler sees — and NEVER kill this process
# mid-compile (a killed remote compile wedges the exclusive chip grant).
tiny = jax.random.uniform(jax.random.key(2), (2, 96, 128, 3), jnp.bfloat16)
float(pipeline(qparams, tiny))
print("tiny-shape compile ok; full-shape compile next (do not kill)",
      file=sys.stderr)

float(pipeline(qparams, images))           # compile + warm
logdir = "/tmp/densebox_profile"
N_CALLS = 3  # single source for the capture loop AND the ms/call divisors
with jax.profiler.trace(logdir):
    for i in range(N_CALLS):
        float(pipeline(qparams, images))
time.sleep(2)

traces = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
print("trace files:", traces)
if traces:
    import re

    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    durs = defaultdict(float)
    by_tf = defaultdict(float)
    # logical buckets: model layers by name, plus the named pipeline stages
    # (window gather kernel, decode, NMS, top-k, resize) — same idea as
    # train_profile.py's tf_op aggregation, tuned for the infer pipeline
    _layer = re.compile(
        r"/(conv\d_\d|det|loc|lm|refine\w*|window_gather\w*|concatenate)[/:]")
    host_markers = (".py", "jit_", "PjitFunction", "np.asarray", "$",
                    "pipeline")
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            if any(m in name for m in host_markers):
                continue        # host-side / whole-program rows
            durs[name] += ev["dur"]
            tf = (ev.get("args") or {}).get("tf_op", "")
            if not tf:
                continue
            m = _layer.search(tf)
            by_tf[m.group(1) if m else tf.split("/")[-1].strip(":")] \
                += ev["dur"]
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:50]
    total = sum(durs.values())
    print(f"total device op-time: {total/1e3:.1f} ms "
          f"({N_CALLS} pipeline calls)")
    for name, d in top:
        print(f"{d/1e3:9.2f} ms  {100*d/total:5.1f}%  {name[:100]}")
    # category rollup: which bucket owns the time
    cats = defaultdict(float)
    for name, d in durs.items():
        base = name.split(".")[0]
        cats[base] += d
    print("--- by op category ---")
    for name, d in sorted(cats.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{d/1e3:9.2f} ms  {100*d/total:5.1f}%  {name[:60]}")
    print("--- by logical op (tf_op metadata, device fusions only) ---")
    tot2 = sum(by_tf.values())
    for name, d in sorted(by_tf.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{d/(N_CALLS*1e3):9.2f} ms/call  {100*d/tot2:5.1f}%  "
              f"{name[:90]}")
