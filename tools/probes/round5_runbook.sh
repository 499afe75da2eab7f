#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r4 "Next round" items 1-5).
# Run from the repo root once the chip grant is healthy:
#   bash tools/probes/round5_runbook.sh [logdir]
# Each step logs to its own file; 20 s sleeps between TPU processes
# (exclusive-grant re-registration race). bench.py probes backend health
# first (420 s/attempt — round-5 measured a HEALTHY cold init at ~270 s)
# and compiles tiny shapes before full shapes.
#
# Decision rules:
#   02 vs 01: head_impl='fused' targets the 14.1 ms (33%) heads bucket of
#     the round-4 train profile. KEEP (flip auto in models/densebox.py +
#     update tests/test_model.py::test_auto_policy_registry) iff
#     steps/s(02) > steps/s(01) by >2% (the session noise band).
#   03: MUST reproduce ~4,213 img/s with NO flags (the lm_dtype auto
#     bf16 flip, VERDICT r4 Missing #2) — if it reads ~3,898 the flip
#     regressed.
#   05: fresh lm4 profile at the default-config baseline — names the
#     next bucket for the >=4,800 target (VERDICT r4 Missing #3).
set -u
LOG=${1:-/tmp/round5}
mkdir -p "$LOG"
cd "$(dirname "$0")/../.."

run() {  # run <name> <cmd...>
    local name=$1; shift
    echo "=== $name: $* (log $LOG/$name.log)"
    "$@" >"$LOG/$name.log" 2>&1
    local rc=$?
    tail -2 "$LOG/$name.log"
    echo "=== $name rc=$rc"
    sleep 20
}

run 01_train_baseline    python bench.py --mode train --preset fast
run 02_train_head_fused  python bench.py --mode train --preset fast --head-impl fused
run 03_lm_default        python bench.py --landmarks 4
run 04_det_headline      python bench.py
run 05_lm_profile        python tools/probes/profile_capture.py --landmarks 4
run 06_pyramid           python bench.py --scales 0.5,0.71,1.0,1.41
echo "=== queue done; grep '\"value\"' $LOG/*.log for the ladder"
grep -h '"value"' "$LOG"/*.log 2>/dev/null
