"""`cli quantize` int8 export: calibrate once, save, and load directly in
detect/eval/serve (the PTQ deployment workflow)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    from densebox_tpu.cli import main

    base = tmp_path_factory.mktemp("qexport")
    workdir = str(base / "run")
    rc = main(["train", "--synthetic", "--workdir", workdir,
               "--steps", "30", "--batch-size", "8", "--width-mult", "0.125",
               "--patch-size", "64", "--std-height", "20", "--max-boxes", "3",
               "--lr", "3e-3", "--ckpt-every", "15", "--log-every", "10"])
    assert rc == 0
    out = str(base / "int8")
    rc = main(["quantize", "--workdir", workdir, "--out", out])
    assert rc == 0
    return workdir, out


def test_export_contains_marker_and_loads(exported):
    from densebox_tpu.train.checkpoint import is_quantized_dir, load_quantized

    workdir, out = exported
    assert is_quantized_dir(os.path.join(out, "ckpt"))
    cfg, qparams, calibration = load_quantized(os.path.join(out, "ckpt"))
    assert "synthetic" in calibration
    assert "det/det_conv1" in qparams and "w_q" in qparams["det/det_conv1"]
    assert cfg.model.width_mult == 0.125


def test_detect_from_export_matches_recalibrated(exported, tmp_path, capsys):
    """detect on the export runs the int8 path and agrees with the same
    qparams applied directly (the export round-trips bit-exactly)."""
    import jax.numpy as jnp

    from densebox_tpu.cli import main
    from densebox_tpu.infer import make_detect_fn
    from densebox_tpu.models.quant import QuantDenseBox
    from densebox_tpu.train.checkpoint import load_quantized

    workdir, out = exported
    import cv2

    rng = np.random.RandomState(0)
    img = (rng.rand(96, 128, 3) * 40).astype(np.uint8)
    img[30:52, 40:62] = 230
    img_path = str(tmp_path / "scene.png")
    cv2.imwrite(img_path, img)

    rc = main(["detect", "--workdir", out, "--image", img_path,
               "--out", str(tmp_path / "dets")])
    assert rc == 0
    cap = capsys.readouterr()
    assert "int8 checkpoint" in cap.err
    n_cli = int(cap.out.split(" detections")[0].rsplit(" ", 1)[-1])

    cfg, qparams, _ = load_quantized(os.path.join(out, "ckpt"))
    detect = make_detect_fn(QuantDenseBox(cfg.model), cfg.infer, cfg.label)
    x = jnp.asarray(
        cv2.cvtColor(img, cv2.COLOR_BGR2RGB), jnp.float32)[None] / 255.0
    ref = detect(qparams, x)
    assert n_cli == int(np.asarray(ref["valid"])[0].sum())


def test_serve_from_export(exported):
    """The HTTP server loads the int8 export and reports quantized=true."""
    import threading
    import urllib.request

    from densebox_tpu.models.quant import QuantDenseBox
    from densebox_tpu.serve import (DetectServer, make_http_server,
                                    serve_forever)
    from densebox_tpu.train.checkpoint import load_quantized

    _, out = exported
    cfg, qparams, _ = load_quantized(os.path.join(out, "ckpt"))
    server = DetectServer(QuantDenseBox(cfg.model), qparams, cfg.infer,
                          cfg.label, canvas_hw=(96, 128), max_batch=2,
                          batch_window_ms=1.0)
    httpd = make_http_server(server, "127.0.0.1", 0,
                             info={"quantized": True})
    stop = threading.Event()
    t = threading.Thread(target=serve_forever, args=(httpd, stop, 0.05),
                         daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            health = json.load(r)
        assert health["quantized"] is True
    finally:
        stop.set()
        t.join(10)
        server.close()


def test_reexport_overwrites(exported, capsys):
    """Re-running `cli quantize` with the same --out refreshes the export
    instead of crashing on the existing orbax step."""
    from densebox_tpu.cli import main
    from densebox_tpu.train.checkpoint import load_quantized

    workdir, out = exported
    rc = main(["quantize", "--workdir", workdir, "--out", out])
    assert rc == 0
    assert "wrote int8 checkpoint" in capsys.readouterr().out
    cfg, qparams, _ = load_quantized(os.path.join(out, "ckpt"))
    assert "det/det_conv1" in qparams
