"""Profile the jitted train step (fast w0.5, batch 128) and aggregate the
top device ops — drives the train-path optimization (BASELINE.md)."""
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

from densebox_tpu.config import DenseBoxConfig, LabelCfg, ModelCfg, TrainCfg
from densebox_tpu.data import synthetic_batch
from densebox_tpu.models import DenseBox
from densebox_tpu.train import create_train_state
from densebox_tpu.train.trainer import make_canvas_train_step

batch, patch = 128, 240
cfg = DenseBoxConfig(
    model=ModelCfg(width_mult=0.5, compute_dtype="bfloat16", stem="s2d",
                   trunk_depth=3),
    label=LabelCfg(patch_size=patch),
    train=TrainCfg(batch_size=batch))
canvas_cfg = LabelCfg(patch_size=2 * patch)
model = DenseBox(cfg.model)
b = synthetic_batch(jax.random.key(0), batch, canvas_cfg, max_boxes=8)
state = create_train_state(model, cfg, b["image"][:1, :patch, :patch])
step = make_canvas_train_step(model, cfg)


@jax.jit
def one(state, b):
    st, metrics = step(state, b)
    return st, metrics["loss_total"]


# compile-bomb guard (BASELINE.md packed-dropout entry): compile a tiny
# 64px/B8 step FIRST so a pathological full-shape compile is never the
# first signal the remote compiler sees — and NEVER kill this process
# mid-compile (a killed remote compile wedges the exclusive chip grant).
_tcfg = DenseBoxConfig(
    model=cfg.model, label=LabelCfg(patch_size=64, std_height_px=50.0 * 64 / 240),
    train=TrainCfg(batch_size=8))
_tb = synthetic_batch(jax.random.key(1), 8, LabelCfg(patch_size=128,
                                                     std_height_px=50.0 * 64 / 240),
                      max_boxes=8)
_tstate = create_train_state(model, _tcfg, _tb["image"][:1, :64, :64])
_, _tm = jax.jit(make_canvas_train_step(model, _tcfg))(_tstate, _tb)
float(_tm["loss_total"])
print("tiny-shape compile ok; full-shape compile next (do not kill)",
      file=sys.stderr)

state, l0 = one(state, b)
float(l0)
logdir = "/tmp/densebox_train_profile"
with jax.profiler.trace(logdir):
    for _ in range(3):
        state, l = one(state, b)
    float(l)
time.sleep(2)

traces = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
print("trace files:", traces)
if traces:
    import re

    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    durs = defaultdict(float)
    by_tf = defaultdict(float)
    _layer = re.compile(r"/(conv\d_\d|det|loc|lm|refine\w*|concatenate"
                        r"|Dropout_0)[/:]")
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "?")
        durs[name] += ev["dur"]
        # logical-op buckets (the per-fusion view below reads "flat" while
        # the heads are actually the largest bucket — round-3 finding)
        if (name.startswith(("$", "jit_", "Pjit")) or "profiler" in name
                or "asarray" in name or name in ("0", "1", "2")):
            continue
        tf = (ev.get("args") or {}).get("tf_op", "")
        if not tf:
            continue
        m = _layer.search(tf)
        stage = ("BWD " if "transpose(jvp" in tf
                 else "FWD " if "jvp(" in tf else "")
        by_tf[stage + (m.group(1) if m else tf.split("/")[-1].strip(":"))] \
            += ev["dur"]
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:35]
    total = sum(durs.values())
    print(f"total traced op-time: {total/1e3:.1f} ms (3 steps)")
    for name, d in top:
        print(f"{d/1e3:9.2f} ms  {100*d/total:5.1f}%  {name[:110]}")
    print("--- by logical op (tf_op metadata, device fusions only) ---")
    tot2 = sum(by_tf.values())
    for name, d in sorted(by_tf.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{d/3e3:9.2f} ms/step  {100*d/tot2:5.1f}%  {name[:90]}")
