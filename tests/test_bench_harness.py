"""bench.py artifact robustness: when the accelerator backend cannot
initialize, the harness must emit ONE structured JSON line (parseable round
artifact) instead of a raw traceback (round-3 verdict: BENCH_r03.json
recorded `rc: 1` + traceback)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_backend_probe_failure_emits_structured_json():
    # drop the axon plugin hook so the probe child fails fast on the
    # unknown platform instead of touching (and waiting on) the TPU tunnel
    env = dict(os.environ, JAX_PLATFORMS="bogus_backend")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--smoke",
         "--backend-probe", "on", "--probe-retries", "2",
         "--probe-backoff", "0", "--probe-timeout", "60"],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env)
    assert r.returncode == 1, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert lines, r.stdout
    obj = json.loads(lines[-1])
    assert obj["stage"] == "backend-init" and obj["value"] is None
    assert "error" in obj and obj["error"]
    # the bounded retry actually ran (attempt log on stderr)
    assert "retrying in" in r.stderr
