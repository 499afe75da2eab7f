#!/bin/bash
# Round-4 TPU measurement queue (docs/ROADMAP.md "Round-4 TPU runbook").
# Run from the repo root once the chip grant is healthy:
#   bash tools/probes/round4_runbook.sh [logdir]
# Each step logs to its own file; 20 s sleeps between TPU processes
# (exclusive-grant re-registration race — memory notes). bench.py itself
# probes backend health first and compiles tiny shapes before full shapes.
set -u
LOG=${1:-/tmp/round4}
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

run 01_det_headline      python bench.py
run 02_train_baseline    python bench.py --mode train --preset fast
run 03_train_skip_split  python bench.py --mode train --preset fast --skip-fusion split
run 04_lm_baseline       python bench.py --landmarks 4
run 05_lm_bf16           python bench.py --landmarks 4 --lm-dtype bfloat16
run 06_lm_dp16           python bench.py --landmarks 4 --lm-window-dp 16
run 07_lm_refine32       python bench.py --landmarks 4 --refine-width 32
run 08_pyramid           python bench.py --scales 0.5,0.71,1.0,1.41
run 09_serving           python tools/probes/serve_loadtest.py --turbo-int8 --clients 1 4 16
echo "=== queue done; grep '\"value\"' $LOG/*.log for the ladder"
grep -h '"value"\|req_per_s' "$LOG"/*.log 2>/dev/null
