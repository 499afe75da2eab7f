"""Serving-layer loadtest: concurrent clients against DetectServer.

Measures sustained requests/s, per-request latency percentiles (p50/p99),
and the coalescing ratio (requests per device call) at each concurrency
level. Run with the TPU attached for production numbers; on CPU it
validates the batching machinery (the device call dominates either way).

    # CPU machinery check (tiny trained model):
    python tools/probes/serve_loadtest.py --cpu

    # TPU production numbers (headline turbo int8 config, 480x640 canvas):
    python tools/probes/serve_loadtest.py --turbo-int8 --clients 1 4 16

Emits one JSON line per concurrency level (BASELINE.md serving table).
"""
import argparse
import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

ap = argparse.ArgumentParser()
ap.add_argument("--clients", type=int, nargs="+", default=[16])
ap.add_argument("--requests", type=int, default=96,
                help="requests per concurrency level")
ap.add_argument("--max-batch", type=int, default=8)
ap.add_argument("--window-ms", type=float, default=5.0)
ap.add_argument("--canvas", type=int, nargs=2, default=None,
                help="default: 96x128 (tiny) / 480x640 (--turbo-int8)")
ap.add_argument("--cpu", action="store_true",
                help="pin the CPU backend (the default on a wedged tunnel)")
ap.add_argument("--turbo-int8", action="store_true",
                help="serve the headline turbo int8 config (random-init "
                     "weights — serving latency does not depend on them) "
                     "instead of training a tiny model first")
args = ap.parse_args()

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

from densebox_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from densebox_tpu.serve import DetectServer

canvas = tuple(args.canvas or ((480, 640) if args.turbo_int8 else (96, 128)))


def scene(seed, hw):
    rng = np.random.RandomState(seed)
    img = (rng.rand(*hw, 3) * 40).astype(np.float32)
    img[30:52, 40:62] = 230.0
    return img / 255.0


def run_level(make_server, n_clients):
    server = make_server()
    lats = []
    issued = 0
    lock = threading.Lock()

    def client(cid):
        nonlocal issued
        img = scene(cid, canvas)
        while True:
            with lock:
                if issued >= args.requests:
                    return
                issued += 1
            t0 = time.perf_counter()
            server.submit(img)
            with lock:
                lats.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    stats = dict(server.stats)
    server.close()
    lats_ms = np.sort(np.asarray(lats)) * 1e3
    ratio = stats["requests"] / max(stats["device_calls"], 1)
    print(json.dumps({
        "clients": n_clients, "requests": len(lats),
        "req_per_s": round(len(lats) / dt, 1),
        "p50_ms": round(float(np.percentile(lats_ms, 50)), 1),
        "p99_ms": round(float(np.percentile(lats_ms, 99)), 1),
        "coalescing_ratio": round(ratio, 2),
        "device_calls": stats["device_calls"],
        "max_batch": args.max_batch, "canvas": list(canvas),
    }))


def make_turbo_server():
    import jax
    import jax.numpy as jnp

    from densebox_tpu.config import InferCfg, LabelCfg, ModelCfg
    from densebox_tpu.models import DenseBox
    from densebox_tpu.models.quant import QuantDenseBox, quantize_densebox

    cfg = ModelCfg(width_mult=0.25, compute_dtype="bfloat16", stem="s2d4",
                   trunk_depth=3)
    model = DenseBox(cfg)
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
    calib = jax.random.uniform(jax.random.key(0), (2, *canvas, 3),
                               jnp.float32)
    qparams = quantize_densebox(params, cfg, calib)
    icfg = InferCfg(scales=(1.0,), score_thresh=0.5, topk_per_scale=256,
                    max_dets=128, approx_topk=True)
    return lambda: DetectServer(QuantDenseBox(cfg), qparams, icfg,
                                LabelCfg(), canvas_hw=canvas,
                                max_batch=args.max_batch,
                                batch_window_ms=args.window_ms)


def make_tiny_server(td):
    from densebox_tpu.cli import main as cli_main
    from densebox_tpu.models import DenseBox
    from densebox_tpu.train.checkpoint import load_for_inference

    workdir = os.path.join(td, "run")
    rc = cli_main(["train", "--synthetic", "--workdir", workdir,
                   "--steps", "20", "--batch-size", "8",
                   "--width-mult", "0.125", "--patch-size", "64",
                   "--std-height", "20", "--max-boxes", "3",
                   "--ckpt-every", "10", "--log-every", "10"])
    assert rc == 0
    cfg, params = load_for_inference(os.path.join(workdir, "ckpt"))
    return lambda: DetectServer(DenseBox(cfg.model), params, cfg.infer,
                                cfg.label, canvas_hw=canvas,
                                max_batch=args.max_batch,
                                batch_window_ms=args.window_ms)


if args.turbo_int8:
    factory = make_turbo_server()
    for n in args.clients:
        run_level(factory, n)
else:
    with tempfile.TemporaryDirectory() as td:
        factory = make_tiny_server(td)
        for n in args.clients:
            run_level(factory, n)
