"""StableHLO export surface (densebox_tpu/export.py + cli export): the
serialized artifact reproduces the live pipeline's detections and is
loadable with jax alone (no densebox_tpu, no checkpoint)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_workdir(tmp_path_factory):
    from densebox_tpu.cli import main

    workdir = str(tmp_path_factory.mktemp("export_run") / "run")
    rc = main(["train", "--synthetic", "--workdir", workdir,
               "--steps", "30", "--batch-size", "8", "--width-mult", "0.125",
               "--patch-size", "64", "--std-height", "20", "--max-boxes", "3",
               "--lr", "3e-3", "--ckpt-every", "15", "--log-every", "10"])
    assert rc == 0
    return workdir


def _scene(seed=0, h=96, w=128):
    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w, 3) * 40).astype(np.float32)
    img[30:52, 40:62] = 230.0
    return img / 255.0


def test_export_roundtrip_matches_live_pipeline(trained_workdir, tmp_path):
    import jax.numpy as jnp

    from densebox_tpu.cli import main
    from densebox_tpu.export import load_exported
    from densebox_tpu.infer import make_detect_fn
    from densebox_tpu.models import DenseBox
    from densebox_tpu.train.checkpoint import load_for_inference

    out = str(tmp_path / "detect.stablehlo")
    rc = main(["export", "--workdir", trained_workdir, "--out", out,
               "--batch", "2", "--canvas", "96", "128"])
    assert rc == 0 and os.path.exists(out)

    call, meta = load_exported(out)
    assert meta["batch"] == 2 and meta["canvas"] == [96, 128]
    x = np.stack([_scene(0), _scene(1)]).astype(np.float32)
    got = {k: np.asarray(v) for k, v in call(x).items()}

    cfg, params = load_for_inference(f"{trained_workdir}/ckpt")
    detect = make_detect_fn(DenseBox(cfg.model), cfg.infer, cfg.label)
    want = {k: np.asarray(v) for k, v in detect(params, jnp.asarray(x)).items()}

    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-5, err_msg=k)


def test_export_loads_without_densebox(trained_workdir, tmp_path):
    """The deployment claim: the artifact runs in a process that imports
    jax only — no densebox_tpu on the path, no checkpoint."""
    from densebox_tpu.cli import main

    out = str(tmp_path / "detect.stablehlo")
    rc = main(["export", "--workdir", trained_workdir, "--out", out,
               "--batch", "1", "--canvas", "96", "128", "--no-verify"])
    assert rc == 0

    code = f"""
import sys
sys.modules['densebox_tpu'] = None  # hard-block accidental imports
import json
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
from jax import export as jexport
MAGIC = b"DENSEBOX_STABLEHLO_V1\\n"
with open({out!r}, 'rb') as f:
    assert f.read(len(MAGIC)) == MAGIC
    meta = json.loads(f.readline().decode())
    exported = jexport.deserialize(f.read())
x = np.zeros(tuple([meta['batch'], *meta['canvas'], 3]), np.float32)
out = exported.call(x)
print(json.dumps(sorted(out.keys())))
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300, env=env, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    keys = json.loads(r.stdout.strip().splitlines()[-1])
    assert "boxes" in keys and "scores" in keys and "valid" in keys


def test_export_quantized(trained_workdir, tmp_path):
    """The int8-PTQ pipeline exports and its artifact reproduces the live
    quantized pipeline."""
    import jax.numpy as jnp

    from densebox_tpu.cli import main
    from densebox_tpu.export import load_exported

    out = str(tmp_path / "detect_int8.stablehlo")
    rc = main(["export", "--workdir", trained_workdir, "--out", out,
               "--batch", "1", "--canvas", "96", "128", "--quantize"])
    assert rc == 0
    call, meta = load_exported(out)
    assert meta["quantized"] is True
    got = call(_scene()[None].astype(np.float32))
    assert np.asarray(got["boxes"]).shape[-1] == 4
    v = np.asarray(got["valid"])       # padded slots carry -inf scores
    assert np.isfinite(np.asarray(got["scores"])[v]).all()


def test_serve_from_artifact(trained_workdir, tmp_path):
    """`cli serve --artifact` serves an exported program: HTTP detections
    match the live pipeline's, and healthz reports the artifact contract."""
    import threading
    import urllib.request

    import cv2

    from densebox_tpu.cli import main
    from densebox_tpu.serve import DetectServer, make_http_server, \
        serve_forever

    out = str(tmp_path / "detect.stablehlo")
    rc = main(["export", "--workdir", trained_workdir, "--out", out,
               "--batch", "2", "--canvas", "96", "128", "--no-verify"])
    assert rc == 0

    server = DetectServer.from_exported(out, batch_window_ms=1.0)
    httpd = make_http_server(server, "127.0.0.1", 0,
                             info={"artifact": out, **server.meta})
    port = httpd.server_address[1]
    stop = threading.Event()
    t = threading.Thread(target=serve_forever, args=(httpd, stop, 0.05),
                         daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            health = json.load(r)
        assert health["canvas"] == [96, 128] and health["batch"] == 2

        img_u8 = (np.clip(_scene(), 0, 1) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(".png",
                               cv2.cvtColor(img_u8, cv2.COLOR_RGB2BGR))
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=buf.tobytes(),
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=60) as r:
            resp = json.load(r)
        assert resp["n"] == len(resp["boxes"]) == len(resp["scores"])
    finally:
        stop.set()
        t.join(10)
        server.close()

    with pytest.raises(ValueError, match="re-export"):
        DetectServer.from_exported(out, max_batch=16, warmup=False)


def test_export_multi_platform(trained_workdir, tmp_path):
    """--platforms cpu,tpu lowers one module with platform dispatch; it
    must still load and run on the CPU host."""
    from densebox_tpu.cli import main
    from densebox_tpu.export import load_exported

    out = str(tmp_path / "multi.stablehlo")
    rc = main(["export", "--workdir", trained_workdir, "--out", out,
               "--batch", "1", "--canvas", "96", "128",
               "--platforms", "cpu,tpu", "--no-verify"])
    assert rc == 0
    call, meta = load_exported(out)
    assert set(meta["platforms"]) == {"cpu", "tpu"}
    got = call(np.zeros((1, 96, 128, 3), np.float32))
    assert np.asarray(got["boxes"]).shape == (1, 128, 4)
