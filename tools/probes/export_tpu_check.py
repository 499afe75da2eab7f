"""Exercise the StableHLO export artifact ON THE TPU (VERDICT r4 item 4).

The export surface was CPU-tested only through round 4; the one risky part
of the artifact story — Pallas (Mosaic) custom calls surviving
export → serialize → reload → execute on the actual chip — had never
touched a TPU. This probe does the full loop:

  --build  (run with JAX_PLATFORMS=cpu): train a tiny synthetic
           landmark-enabled model (landmarks force the Pallas window
           kernel and its tpu_custom_call into the program), then
           `cli export --platforms cpu,tpu` to PATH.
  --run    (run WITHOUT JAX_PLATFORMS — real chip): load the artifact
           with jax.export only, execute on the TPU, check detections
           structurally (shapes, finiteness, valid flags), and time
           repeated calls with scalar-readback sync.

Usage:
  JAX_PLATFORMS=cpu python tools/probes/export_tpu_check.py --build
  python tools/probes/export_tpu_check.py --run
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

ART = "/tmp/round5/export_check/turbo_lm4.stablehlo"
WORKDIR = "/tmp/round5/export_check/run"


def build() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from densebox_tpu.cli import main

    os.makedirs(os.path.dirname(ART), exist_ok=True)
    if not os.path.exists(os.path.join(WORKDIR, "config.json")):
        rc = main(["train", "--synthetic", "--workdir", WORKDIR,
                   "--steps", "30", "--batch-size", "8",
                   "--width-mult", "0.25", "--stem", "s2d4",
                   "--trunk-depth", "3", "--patch-size", "64",
                   "--std-height", "20", "--max-boxes", "3",
                   "--landmarks", "4", "--lr", "3e-3",
                   "--ckpt-every", "15", "--log-every", "10"])
        if rc:
            return rc
    # batch 8 x 480x640 canvas: the serving contract shape. cpu,tpu both
    # lowered; the TPU module carries the Mosaic window-gather custom call.
    return main(["export", "--workdir", WORKDIR, "--out", ART,
                 "--batch", "8", "--canvas", "480", "640",
                 "--platforms", "cpu,tpu"])


def run() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from densebox_tpu.export import load_exported
    from densebox_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    call, meta = load_exported(ART)
    print("meta:", json.dumps(meta), flush=True)
    b, h, w = meta["batch"], meta["canvas"][0], meta["canvas"][1]
    rng = np.random.RandomState(0)
    img = (rng.rand(b, h, w, 3) * 0.15).astype(np.float32)
    img[:, 200:260, 280:340] = 0.9  # a bright square someone might detect
    x = jax.device_put(jnp.asarray(img), dev)

    cj = jax.jit(call)
    t0 = time.perf_counter()
    out = cj(x)
    # scalar-readback sync (block_until_ready is a no-op on axon)
    s0 = float(out["scores"].astype(jnp.float32).sum())
    compile_s = time.perf_counter() - t0

    # Invalid output slots carry a -inf score sentinel BY DESIGN
    # (detector.py pre-NMS cap + nms.py top_k padding) — finiteness is
    # only a correctness property of the valid slots.
    valid = out["valid"].astype(bool)
    checks = {
        "boxes_shape": list(out["boxes"].shape),
        "scores_finite": bool(jnp.where(valid, jnp.isfinite(
            out["scores"]), True).all()),
        "invalid_are_neginf": bool(jnp.where(
            valid, True, out["scores"] == -jnp.inf).all()),
        "boxes_finite": bool(jnp.isfinite(out["boxes"]).all()),
        "lm_points": ("lm_points" in out
                      and list(out["lm_points"].shape)),
        "n_valid": int(valid.sum()),
    }
    # timed repeats, in-process (per-call sync; the point is "it executes
    # on the chip", not peak throughput — bench.py owns that)
    reps, t0 = 5, time.perf_counter()
    for i in range(reps):
        float(cj(x + jnp.float32(1e-6) * i)["scores"]
              .astype(jnp.float32).sum())
    per_call = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "probe": "export_tpu_check", "platform": str(dev),
        "compile_s": round(compile_s, 1),
        "ms_per_call": round(1e3 * per_call, 1),
        "img_per_s": round(b / per_call, 1),
        "checks": checks, "scores_sum_incl_sentinels": s0,
    }), flush=True)
    ok = (checks["scores_finite"] and checks["boxes_finite"]
          and checks["invalid_are_neginf"])
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--run", action="store_true")
    a = ap.parse_args()
    if a.build:
        return build()
    if a.run:
        return run()
    ap.error("pass --build (CPU) or --run (TPU)")


if __name__ == "__main__":
    sys.exit(main())
