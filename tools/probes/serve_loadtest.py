"""Serving-layer loadtest: N concurrent clients against DetectServer.

Measures sustained requests/s and the coalescing ratio (requests per
device call). Run with the TPU attached for production numbers; on CPU it
validates the batching machinery (the device call dominates either way).

    python tools/probes/serve_loadtest.py [--clients 16] [--requests 96]
"""
import argparse
import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

ap = argparse.ArgumentParser()
ap.add_argument("--clients", type=int, default=16)
ap.add_argument("--requests", type=int, default=96)
ap.add_argument("--max-batch", type=int, default=8)
ap.add_argument("--window-ms", type=float, default=5.0)
ap.add_argument("--canvas", type=int, nargs=2, default=(96, 128))
ap.add_argument("--cpu", action="store_true",
                help="pin the CPU backend (the default on a wedged tunnel)")
args = ap.parse_args()

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

from densebox_tpu.cli import main as cli_main
from densebox_tpu.models import DenseBox
from densebox_tpu.serve import DetectServer
from densebox_tpu.train.checkpoint import load_for_inference


def scene(seed):
    rng = np.random.RandomState(seed)
    img = (rng.rand(96, 128, 3) * 40).astype(np.float32)
    img[30:52, 40:62] = 230.0
    return img / 255.0


with tempfile.TemporaryDirectory() as td:
    workdir = os.path.join(td, "run")
    rc = cli_main(["train", "--synthetic", "--workdir", workdir,
                   "--steps", "20", "--batch-size", "8",
                   "--width-mult", "0.125", "--patch-size", "64",
                   "--std-height", "20", "--max-boxes", "3",
                   "--ckpt-every", "10", "--log-every", "10"])
    assert rc == 0
    cfg, params = load_for_inference(os.path.join(workdir, "ckpt"))
    server = DetectServer(DenseBox(cfg.model), params, cfg.infer, cfg.label,
                          canvas_hw=tuple(args.canvas),
                          max_batch=args.max_batch,
                          batch_window_ms=args.window_ms)

    done = 0
    lock = threading.Lock()

    def client(cid):
        global done
        while True:
            with lock:
                if done >= args.requests:
                    return
                done += 1
            server.submit(scene(cid))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    server.close()
    rps = args.requests / dt
    ratio = server.stats["requests"] / max(server.stats["device_calls"], 1)
    print(f"{rps:.1f} req/s over {args.clients} clients "
          f"({server.stats['requests']} requests / "
          f"{server.stats['device_calls']} device calls = "
          f"{ratio:.2f} coalescing ratio, max_batch {args.max_batch})")
