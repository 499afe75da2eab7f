"""Batched inference serving (production-deployment surface).

The reference stops at a ``test.py`` script; a production deployment needs
a long-lived process that keeps the compiled program warm and batches
concurrent requests onto the accelerator. This module provides exactly
that, TPU-style:

  * ONE compiled program: requests are letterboxed onto a fixed
    ``(max_batch, H, W, 3)`` canvas (downscale-to-fit, top-left placement
    — the same geometry contract as ``data/pipeline.py::canvas_batch``),
    so every request reuses the same jit cache entry; short batches pad
    with zero images whose results are dropped.
  * request coalescing: the first queued request opens a small batching
    window (``batch_window_ms``); everything that arrives inside it rides
    the same device call. Throughput scales toward ``bench.py``'s batched
    numbers under load while a lone request only pays the window.
  * results come back in ORIGINAL image coordinates (the letterbox scale
    is inverted per request).

``python -m densebox_tpu.cli serve --workdir run --port 8471`` exposes it
over HTTP (stdlib server, no new dependencies): POST /detect with an
encoded image body -> JSON detections; GET /healthz -> model/config info.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

# /detect body cap: an encoded image legitimately tops out in the low MBs;
# anything larger is a client bug or abuse — refuse with 413 instead of
# allocating arbitrary memory in a handler thread.
MAX_BODY_BYTES = 32 * 1024 * 1024


class DetectServer:
    """Request-coalescing wrapper around one jitted detect program."""

    def __init__(self, model, params, infer_cfg, label_cfg,
                 canvas_hw: Tuple[int, int] = (480, 640),
                 max_batch: int = 8, batch_window_ms: float = 15.0,
                 warmup: bool = True):
        # max_batch=8 / window=15 ms: measured winners of the round-5
        # 3x3 tuning grid (BASELINE.md, 16 clients, TPU): 6.3 req/s
        # p50 1,808 ms vs 5.6/2,741 at the old 5 ms window; deeper
        # max_batch loses outright (32 -> 3.9-4.4 req/s: bucket
        # padding waste dominates once coalescing is capped by the
        # client count). The wider window costs <=10 ms at idle --
        # noise against the ~440 ms single-client round trip.
        from densebox_tpu.infer import make_detect_fn

        detect = make_detect_fn(model, infer_cfg, label_cfg)
        self._init(lambda x: detect(params, x), canvas_hw, max_batch,
                   batch_window_ms, warmup)

    @classmethod
    def from_exported(cls, path: str, max_batch: Optional[int] = None,
                      batch_window_ms: float = 15.0, warmup: bool = True
                      ) -> "DetectServer":
        """Serve a ``cli export`` StableHLO artifact directly — the serving
        process needs jax only, not the model code or the checkpoint. The
        artifact's fixed (batch, H, W) contract becomes the serving
        (max_batch, canvas); ``max_batch`` may only restate it."""
        from densebox_tpu.export import load_exported

        call, meta = load_exported(path)
        if max_batch is not None and max_batch != meta["batch"]:
            raise ValueError(
                f"artifact was exported with batch {meta['batch']}; "
                f"max_batch {max_batch} cannot differ (fixed StableHLO "
                "shapes) — re-export with --batch")
        self = cls.__new__(cls)
        self._init(call, tuple(meta["canvas"]), meta["batch"],
                   batch_window_ms, warmup)
        self.meta = meta
        return self

    def _init(self, detect_fn, canvas_hw, max_batch, batch_window_ms,
              warmup) -> None:
        import jax.numpy as jnp

        self._jnp = jnp
        self.canvas_hw = canvas_hw
        self.max_batch = max_batch
        self.window_s = batch_window_ms / 1e3
        # observability: device_calls vs requests shows the coalescing
        # ratio (healthz reports it; the loadtest probe asserts on it)
        self.stats = {"requests": 0, "device_calls": 0}
        self._detect = detect_fn
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        if warmup:
            hc, wc = canvas_hw
            self._detect(jnp.zeros((max_batch, hc, wc, 3), jnp.float32))

    # -- request path ------------------------------------------------------

    def _letterbox(self, img: np.ndarray) -> Tuple[np.ndarray, float]:
        import cv2

        hc, wc = self.canvas_hw
        h, w = img.shape[:2]
        f = min(1.0, hc / h, wc / w)
        if f < 1.0:
            img = cv2.resize(img, (int(w * f), int(h * f)),
                             interpolation=cv2.INTER_AREA)
            h, w = img.shape[:2]
        canvas = np.zeros((hc, wc, 3), np.float32)
        canvas[:h, :w] = img
        return canvas, f

    def submit(self, image_rgb_f32: np.ndarray,
               timeout: Optional[float] = 60.0) -> Dict[str, np.ndarray]:
        """Blocking detect on one (H, W, 3) float32 RGB image in [0, 1].
        Returns numpy detections in the image's own coordinates."""
        if self._stop.is_set():
            raise RuntimeError("server closed")
        canvas, f = self._letterbox(image_rgb_f32)
        done = threading.Event()
        slot: Dict[str, np.ndarray] = {}
        self._q.put((canvas, f, done, slot))
        if self._stop.is_set() and not done.wait(0.05):
            # raced with close(): our item may have been enqueued after the
            # close-side drain, with no worker left to consume it — fail
            # fast instead of riding out the full request timeout.
            raise RuntimeError("server closed")
        if not done.wait(timeout):
            raise TimeoutError("detect request timed out")
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot

    def close(self) -> None:
        self._stop.set()
        self._q.put(None)
        self._worker.join(5.0)
        # fail pending requests fast instead of leaving their submit()
        # callers to ride out the full request timeout
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                _, _, done, slot = item
                slot["error"] = "server closed"
                done.set()

    # -- device loop -------------------------------------------------------

    def _collect(self) -> List[tuple]:
        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.monotonic() + self.window_s
        while len(batch) < self.max_batch:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                item = self._q.get(timeout=left)
            except queue.Empty:
                break
            if item is None:
                break
            batch.append(item)
        return batch

    def _run(self) -> None:
        hc, wc = self.canvas_hw
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            try:
                x = np.zeros((self.max_batch, hc, wc, 3), np.float32)
                for i, (canvas, _, _, _) in enumerate(batch):
                    x[i] = canvas
                self.stats["requests"] += len(batch)
                self.stats["device_calls"] += 1
                out = self._detect(self._jnp.asarray(x))
                out = {k: np.asarray(v) for k, v in out.items()}
                for i, (_, f, done, slot) in enumerate(batch):
                    v = out["valid"][i]
                    slot["boxes"] = out["boxes"][i][v] / f
                    slot["scores"] = out["scores"][i][v]
                    if "lm_points" in out:
                        slot["lm_points"] = out["lm_points"][i][v] / f
                        slot["lm_valid"] = out["lm_valid"][i][v]
                    done.set()
            except Exception as e:  # noqa: BLE001 - relayed per request
                for _, _, done, slot in batch:
                    slot["error"] = f"{type(e).__name__}: {e}"
                    done.set()


def make_http_server(server: DetectServer, host: str, port: int,
                     info: Optional[dict] = None):
    """Build the stdlib HTTP front-end (bound but not serving; port 0 picks
    an ephemeral port — read it from ``.server_address``). POST /detect
    (encoded image body) -> JSON; GET /healthz -> model info."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; serving logs are the caller's
            pass

        def _json(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", **server.stats,
                                 **(info or {})})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/detect":
                self._json(404, {"error": "unknown path"})
                return
            import cv2

            n = int(self.headers.get("Content-Length", 0))
            if n > MAX_BODY_BYTES:
                self._json(413, {"error": "request body too large "
                                          f"(max {MAX_BODY_BYTES} bytes)"})
                return
            raw = self.rfile.read(n)
            img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                self._json(400, {"error": "could not decode image"})
                return
            rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)
            try:
                dets = server.submit(rgb / 255.0)
            except (TimeoutError, RuntimeError) as e:
                self._json(500, {"error": str(e)})
                return
            resp = {"n": int(len(dets["boxes"])),
                    "boxes": np.round(dets["boxes"], 2).tolist(),
                    "scores": np.round(dets["scores"], 4).tolist()}
            if "lm_points" in dets:
                resp["lm_points"] = np.round(dets["lm_points"], 2).tolist()
                resp["lm_valid"] = dets["lm_valid"].tolist()
            self._json(200, resp)

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever(httpd, stop_event: Optional[threading.Event] = None,
                  poll_s: float = 0.25) -> None:
    """Serve until ``stop_event`` is set (or forever)."""
    httpd.timeout = poll_s
    try:
        while stop_event is None or not stop_event.is_set():
            httpd.handle_request()
    finally:
        httpd.server_close()
