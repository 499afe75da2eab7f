#!/bin/bash
# Round-5 serving tuning sweep (VERDICT r4 item 5 / Weak #3).
# max_batch {8,32,64} x batch_window_ms {2,5,15} at 16 clients, turbo
# int8, TPU. One loadtest process per cell (exclusive-grant hygiene:
# 15 s sleeps between processes). 192 requests/cell so the deeper
# batches see enough load to fill.
#   bash tools/probes/round5_serve_sweep.sh [logdir]
set -u
LOG=${1:-/tmp/round5_serve}
mkdir -p "$LOG"
cd "$(dirname "$0")/../.."

for mb in 8 32 64; do
    for win in 2 5 15; do
        name="mb${mb}_w${win}"
        echo "=== $name (log $LOG/$name.log)"
        python tools/probes/serve_loadtest.py --turbo-int8 \
            --clients 16 --requests 192 \
            --max-batch "$mb" --window-ms "$win" \
            >"$LOG/$name.log" 2>&1
        echo "=== $name rc=$?"
        tail -1 "$LOG/$name.log"
        sleep 15
    done
done
echo "=== sweep done"
grep -h '"req_per_s"\|"p50_ms"' "$LOG"/*.log 2>/dev/null
