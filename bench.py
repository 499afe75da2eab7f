"""Benchmark harness — dense 640x480 inference images/sec/chip.

Tracked metric + target from BASELINE.md: >=5,000 640x480 images/sec/chip
dense inference on TPU v5e (BASELINE.json:5). Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measurement methodology (important on this machine): the axon TPU tunnel has
~25-30 ms round-trip latency per host sync, slow D2H bandwidth, and a
block_until_ready that does NOT actually block. So the timed region chains
ITERS full pipeline invocations inside ONE jitted fori_loop (inputs perturbed
per iteration to defeat CSE) and syncs on a single scalar readback; the
tunnel round-trip is paid once and amortized.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

from densebox_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def _emit_failure(stage: str, detail: str) -> None:
    """The round artifact must stay parseable even when the hardware is
    sick: emit ONE structured JSON line instead of a traceback (round-3
    verdict: BENCH_r03.json recorded a raw backend-init traceback)."""
    print(json.dumps({
        "error": detail, "stage": stage,
        "backend": os.environ.get("JAX_PLATFORMS") or "axon/tpu",
        "value": None,
    }))
    sys.exit(1)


def probe_backend(retries: int = 3, backoff_s: float = 60.0,
                  timeout_s: float = 420.0) -> None:
    """Verify the accelerator backend initializes BEFORE committing this
    process to it. The axon chip grant is exclusive and can be left wedged
    by killed remote compiles (BASELINE.md round-3 'packed dropout');
    a wedged grant makes init hang indefinitely, which cannot be timed out
    in-process — so probe in a subprocess with a hard timeout and bounded
    backoff (the wedge clears when the remote compile finishes). Killing
    an init-hung probe child is safe; it is killing a process mid-COMPILE
    that wedges the grant."""
    code = ("import jax, jax.numpy as jnp; d = jax.devices(); "
            "print(float(jnp.ones((8, 8)).sum()), d[0])")
    last = "unknown"
    for attempt in range(retries):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=timeout_s)
            if r.returncode == 0:
                # exclusive-grant re-registration race between chained TPU
                # processes (memory/BASELINE notes): give the grant time to
                # release before this process claims it
                time.sleep(15)
                return
            err = r.stderr.strip().splitlines()
            last = err[-1] if err else f"probe exited rc {r.returncode}"
        except subprocess.TimeoutExpired:
            last = (f"backend init timed out after {timeout_s:.0f}s "
                    "(exclusive chip grant wedged? see BASELINE.md)")
        if attempt < retries - 1:
            print(f"bench: backend probe failed ({last}); "
                  f"retrying in {backoff_s:.0f}s "
                  f"[{attempt + 1}/{retries}]", file=sys.stderr)
            time.sleep(backoff_s)
    _emit_failure("backend-init", last)


def _bench_train(args, model_cfg, batch: int, iters: int) -> None:
    """steps/sec of the full jitted train step, on-device end to end."""
    from densebox_tpu.config import (DenseBoxConfig, LabelCfg, LossCfg,
                                     TrainCfg)
    from densebox_tpu.data import synthetic_batch
    from densebox_tpu.models import DenseBox
    from densebox_tpu.train import create_train_state
    from densebox_tpu.train.trainer import make_canvas_train_step

    patch = 64 if args.smoke else args.patch

    def build(patch_px: int, bsz: int):
        cfg = DenseBoxConfig(
            model=model_cfg,
            label=LabelCfg(patch_size=patch_px,
                           std_height_px=50.0 * patch_px / 240),
            loss=LossCfg(backend=args.ohem_backend),
            train=TrainCfg(batch_size=bsz, remat=args.remat,
                           canvas_dtype=args.canvas_dtype))
        canvas_cfg = LabelCfg(patch_size=2 * patch_px,
                              std_height_px=cfg.label.std_height_px)
        model = DenseBox(cfg.model)
        from densebox_tpu.config import resolved_canvas_dtype
        b = synthetic_batch(jax.random.key(0), bsz, canvas_cfg, max_boxes=8,
                            image_dtype=resolved_canvas_dtype(cfg))
        state = create_train_state(model, cfg,
                                   b["image"][:1, :patch_px, :patch_px])
        return cfg, model, b, state

    if not args.smoke and args.compile_probe in ("auto", "on") and (
            args.compile_probe == "on"
            or jax.default_backend() not in ("cpu",)):
        # tiny-shape train-step compile first (compile-bomb guard — see the
        # infer-path comment / BASELINE.md packed-dropout entry)
        t_p0 = time.perf_counter()
        pcfg, pmodel, pb, pstate = build(64, 8)
        pstep = make_canvas_train_step(pmodel, pcfg)
        pstate, pmetrics = jax.jit(pstep)(pstate, pb)
        float(pmetrics["loss_total"])
        print(f"bench: tiny-shape train compile probe ok "
              f"({time.perf_counter() - t_p0:.1f}s). Full-shape compile "
              "next — NEVER kill this process mid-compile (BASELINE.md).",
              file=sys.stderr)

    cfg, model, b, state = build(patch, batch)
    step = make_canvas_train_step(model, cfg)

    @jax.jit
    def loop(state, b):
        def body(_, carry):
            st, acc = carry
            st, metrics = step(st, b)
            return st, acc + metrics["loss_total"]
        return jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0)))

    try:
        t_c0 = time.perf_counter()
        st, acc = loop(state, b)
        float(acc)
        compile_s = time.perf_counter() - t_c0
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(loop(state, b)[1])
            best = min(best, time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001 — artifact must stay parseable
        _emit_failure("compile-or-run", f"{type(e).__name__}: {e}")
    steps_s = iters / best
    print(json.dumps({
        "device": str(jax.devices()[0]), "preset": args.preset,
        "batch": batch, "patch": patch, "compile_s": round(compile_s, 1),
        "ms_per_step": round(1e3 * best / iters, 2)}), file=sys.stderr)
    # Train target declared in BASELINE.md (round-3): >=25 steps/s at the
    # reference train config (fast w0.5, batch 128, 240px patches) — ~45%
    # of the naive 3x-forward roofline. The reference publishes no train
    # numbers (BASELINE.json "published": {}), so the target is our own
    # round-over-round bar, not parity.
    print(json.dumps({
        "metric": f"train steps/sec (batch {batch}, {patch}px patches, "
                  "on-device GT+OHEM+SGD)",
        "value": round(steps_s, 2),
        "unit": "steps/sec",
        "vs_baseline": round(steps_s / 25.0, 3),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None,
                    help="default per preset: paper 64 / fast 128 / "
                         "turbo 256 (slim configs need big batches to fill "
                         "the MXU)")
    ap.add_argument("--width-mult", type=float, default=None)
    ap.add_argument("--dtype", default="int8",
                    help="bfloat16 | float32 | int8 (PTQ production path)")
    ap.add_argument("--iters", type=int, default=8,
                    help="pipeline invocations chained inside the jit")
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed repeats; min is reported")
    ap.add_argument("--scales", default="1.0",
                    help="comma-separated pyramid scales")
    ap.add_argument("--landmarks", type=int, default=0)
    ap.add_argument("--patch", type=int, default=240,
                    help="train-mode patch size (declared target config: "
                         "240)")
    ap.add_argument("--preset", default="turbo",
                    choices=["paper", "fast", "turbo"],
                    help="turbo (default, the certified headline config — "
                         "docs/QUALITY.md): s2d4 stem + depth-3 trunk + "
                         "width 0.25; fast: s2d stem + width 0.5 (best-AP "
                         "production config); paper: exact DenseBox "
                         "architecture (the 1e-4-parity config). See README "
                         "for the measured v5e ladder.")
    ap.add_argument("--ohem-backend", default="auto",
                    choices=["auto", "jax", "pallas"],
                    help="OHEM selection backend for --mode train")
    ap.add_argument("--remat", default="auto",
                    choices=["auto", "on", "off"],
                    help="rematerialize the train forward in the backward "
                         "(A/B knob; measured policy in BASELINE.md)")
    ap.add_argument("--canvas-dtype", default="auto",
                    choices=["auto", "float32", "bfloat16"],
                    help="dtype the (synthetic) pipeline delivers train "
                         "canvases in (A/B knob; auto = measured policy, "
                         "config.resolved_canvas_dtype)")
    ap.add_argument("--dropout-impl", default="auto",
                    choices=["auto", "flax", "packed", "fused", "fused8"],
                    help="head dropout backend for --mode train: 'fused' is "
                         "the zero-mask-residual relu+dropout custom VJP "
                         "(A/B knob; measured policy in BASELINE.md)")
    ap.add_argument("--skip-fusion", default="auto",
                    choices=["auto", "concat", "split"],
                    help="head conv1 over the skip concat vs two "
                         "sliced-weight matmuls (A/B knob; measured policy "
                         "in BASELINE.md)")
    ap.add_argument("--pool-impl", default="auto",
                    choices=["auto", "xla", "reshape"],
                    help="2x2 maxpool backend: 'reshape' replaces the "
                         "select_and_scatter backward with fused elementwise "
                         "math (A/B knob; measured policy in BASELINE.md)")
    ap.add_argument("--head-impl", default="auto",
                    choices=["auto", "separate", "fused"],
                    help="prediction heads as per-head conv pairs vs ONE "
                         "conv1 GEMM + block-diagonal conv2 (A/B knob; "
                         "measured policy in BASELINE.md)")
    ap.add_argument("--up-int8", default="auto",
                    choices=["auto", "on", "off"], type=str,
                    help="int8-in/int8-out skip upsample (A/B knob; "
                         "measured policy in BASELINE.md)")
    ap.add_argument("--head-fuse", default="auto",
                    choices=["auto", "on", "off"],
                    help="single concatenated head-conv1 over the shared "
                         "int8 feat (A/B knob; measured policy in "
                         "BASELINE.md)")
    ap.add_argument("--lm-dtype", default="auto",
                    choices=["auto", "float32", "bfloat16"],
                    help="landmark heatmap dtype through the window gather "
                         "+ peak search (A/B knob; measured policy in "
                         "BASELINE.md)")
    ap.add_argument("--tail", default="auto",
                    choices=["auto", "int8", "bf16"],
                    help="dtype of the MXU-starved tail convs (head conv2s "
                         "+ refine branch): bf16 skips their input "
                         "quantize passes (A/B knob; measured policy in "
                         "BASELINE.md)")
    ap.add_argument("--qbackend", default="auto",
                    choices=["auto", "xla", "pallas", "hybrid"],
                    help="int8 conv backend: xla (lax convs) | pallas "
                         "(fused conv+requant kernel) | hybrid (XLA convs "
                         "+ requant-only Pallas epilogue)")
    ap.add_argument("--lm-window-dp", type=int, default=0,
                    help="pallas window-gather detections per grid step "
                         "(in-flight-DMA depth; 0 = kernel default 8; A/B "
                         "knob for the DMA-issue-bound landmark kernel)")
    ap.add_argument("--refine-width", type=int, default=None,
                    help="refine-branch conv width override (A/B knob for "
                         "the landmark pipeline; default ModelCfg 64)")
    ap.add_argument("--stem", default=None, choices=["conv", "s2d", "s2d4"],
                    help="override the preset's stem (s2d4 = whole trunk at "
                         "output stride; the bandwidth-lean variant)")
    ap.add_argument("--trunk-depth", type=int, default=None,
                    help="override the preset's convs per conv3/conv4 block")
    ap.add_argument("--mode", default="infer", choices=["infer", "train"],
                    help="infer = images/sec pipeline; train = steps/sec of "
                         "the full jitted train step (patch sampling + GT "
                         "rasterization + OHEM loss + SGD)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes for CPU smoke testing")
    ap.add_argument("--backend-probe", default="auto",
                    choices=["auto", "on", "off"],
                    help="subprocess-probe backend health (bounded retry) "
                         "before committing to it; auto = on unless --smoke "
                         "or JAX_PLATFORMS=cpu")
    ap.add_argument("--probe-retries", type=int, default=3)
    ap.add_argument("--probe-backoff", type=float, default=60.0,
                    help="seconds between backend probe retries")
    ap.add_argument("--probe-timeout", type=float, default=420.0,
                    help="per-attempt backend init timeout (a wedged grant "
                         "hangs forever; a HEALTHY grant has measured up "
                         "to ~270s cold init on this tunnel — round 5)")
    ap.add_argument("--compile-probe", default="auto",
                    choices=["auto", "on", "off"],
                    help="compile a tiny-shape variant first so a "
                         "pathological full-shape compile is never the "
                         "first thing the remote compiler sees; auto = on "
                         "on TPU backends")
    args = ap.parse_args()

    # --smoke (and explicit JAX_PLATFORMS=cpu) must run on CPU, but this
    # machine's sitecustomize overrides jax_platforms via jax.config at
    # interpreter start — the env var alone cannot deselect the TPU (same
    # gotcha as tests/conftest.py). Force it through jax.config.
    if args.smoke or os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    plats = jax.config.jax_platforms or ""
    on_cpu = plats.split(",")[0] == "cpu"
    want_probe = (args.backend_probe == "on"
                  or (args.backend_probe == "auto" and not on_cpu))
    if want_probe:
        probe_backend(args.probe_retries, args.probe_backoff,
                      args.probe_timeout)

    from densebox_tpu.config import InferCfg, LabelCfg, ModelCfg
    from densebox_tpu.infer import detect_batch
    from densebox_tpu.models import DenseBox

    # per-preset production defaults (measured + certified, BASELINE.md /
    # docs/QUALITY.md); every knob individually overridable
    preset = {"paper": dict(stem="conv", depth=4, wm=1.0, batch=64),
              "fast": dict(stem="s2d", depth=3, wm=0.5, batch=128),
              "turbo": dict(stem="s2d4", depth=3, wm=0.25, batch=256),
              }[args.preset]

    if (args.mode == "infer" and args.dtype == "int8"
            and args.skip_fusion != "auto"):
        # the int8 forward (models/quant.py) materializes the skip concat
        # unconditionally — the knob targets the f32/bf16 model's train
        # path. A silently-identical A/B must not masquerade as a
        # measurement.
        print("warning: --skip-fusion has no effect on the int8 inference "
              "path; use --mode train or --dtype bfloat16", file=sys.stderr)

    h, w = (96, 128) if args.smoke else (480, 640)
    batch = 2 if args.smoke else (args.batch or preset["batch"])
    wm = 0.125 if args.smoke else (args.width_mult or preset["wm"])
    iters = 2 if args.smoke else args.iters

    refine_width = (args.refine_width if args.refine_width is not None
                    else ModelCfg.refine_width)
    cfg = ModelCfg(num_landmarks=args.landmarks,
                   use_refine=args.landmarks > 0,
                   width_mult=wm,
                   compute_dtype=("bfloat16" if args.dtype == "int8"
                                  else args.dtype),
                   stem=args.stem or preset["stem"],
                   trunk_depth=args.trunk_depth or preset["depth"],
                   skip_fusion=args.skip_fusion,
                   dropout_impl=args.dropout_impl,
                   pool_impl=args.pool_impl,
                   head_impl=args.head_impl,
                   refine_width=refine_width)
    model = DenseBox(cfg)
    icfg = InferCfg(scales=tuple(float(s) for s in args.scales.split(",")),
                    score_thresh=0.5, topk_per_scale=256, max_dets=128,
                    approx_topk=True,  # production throughput path opts in
                    lm_dtype=args.lm_dtype,
                    lm_window_dp=args.lm_window_dp)
    lcfg = LabelCfg()

    if args.mode == "train":
        _bench_train(args, cfg, batch, iters)
        return

    dtype = jnp.dtype(args.dtype if args.dtype != "int8" else "bfloat16")
    images = jax.random.uniform(jax.random.key(0), (batch, h, w, 3), dtype)
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
    params = jax.device_put(params)
    if args.dtype == "int8":
        from densebox_tpu.models.quant import (QuantDenseBox,
                                               quantize_densebox)

        params = quantize_densebox(
            params, cfg, images[:2].astype(jnp.float32))
        model = QuantDenseBox(cfg, backend=args.qbackend,
                              up_int8=args.up_int8,
                              head_fuse=args.head_fuse,
                              tail=args.tail)

    @jax.jit
    def pipeline_loop(p, x):
        def body(i, acc):
            xi = x + i.astype(dtype) * jnp.asarray(1e-6, dtype)
            out = detect_batch(model, p, xi, icfg, lcfg)
            # Consume a full-batch reduction of EVERY output so XLA cannot
            # dead-code-eliminate any slice of the pipeline (it will happily
            # DCE whole convs if only one pixel is read — bench methodology,
            # README). The reductions are O(B*max_dets), i.e. free.
            total = jnp.float32(0.0)
            for v in out.values():
                vf = v.astype(jnp.float32)
                total += jnp.where(jnp.isfinite(vf), vf, 0.0).sum()
            return acc + total
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    if args.compile_probe == "on" or (
            args.compile_probe == "auto"
            and jax.default_backend() not in ("cpu",)):
        # tiny-shape compile first: a full-shape compile through the remote
        # axon compiler can be a 20-min pathological case (BASELINE.md
        # packed-dropout entry), and a killed compile RPC wedges the
        # exclusive chip grant for hours. Compiling a 96x128 variant first
        # bounds the risk: it exercises every kernel class in the pipeline
        # in seconds, so the full compile is never the first signal.
        t_p0 = time.perf_counter()
        tiny = jnp.zeros((2, 96, 128, 3), dtype)
        out = jax.jit(lambda p, x: detect_batch(model, p, x, icfg, lcfg))(
            params, tiny)
        float(out["scores"].astype(jnp.float32).sum())  # scalar sync
        print(f"bench: tiny-shape compile probe ok "
              f"({time.perf_counter() - t_p0:.1f}s). Full-shape compile "
              "next — NEVER kill this process mid-compile (a killed remote "
              "compile wedges the chip grant; BASELINE.md).",
              file=sys.stderr)

    try:
        t_c0 = time.perf_counter()
        float(pipeline_loop(params, images))  # compile + warm (scalar sync)
        compile_s = time.perf_counter() - t_c0

        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(pipeline_loop(params, images))
            best = min(best, time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001 — artifact must stay parseable
        _emit_failure("compile-or-run", f"{type(e).__name__}: {e}")

    img_s = batch * iters / best
    info = {
        "device": str(jax.devices()[0]),
        "preset": args.preset,
        "batch": batch, "hw": [h, w], "width_mult": wm,
        "dtype": args.dtype, "scales": icfg.scales, "iters": iters,
        "compile_s": round(compile_s, 1),
        "ms_per_image": round(1e3 * best / (batch * iters), 3),
    }
    print(json.dumps(info), file=sys.stderr)
    print(json.dumps({
        "metric": "640x480 images/sec/chip (dense inference, full "
                  "decode+NMS pipeline)",
        "value": round(img_s, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / 5000.0, 3),
    }))


if __name__ == "__main__":
    main()
