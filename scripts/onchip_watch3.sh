#!/bin/bash
# Round-3 resumable on-chip capture, v3: like onchip_watch2.sh (probe from
# FRESH subprocesses, one stage at a time, per-stage done markers so a
# tunnel flap resumes instead of restarting) PLUS a git commit of each
# successful stage's artifacts (scripts/onchip_collect.sh) — a window that
# opens while no session is attached still lands its results in the repo.
#
# Usage: bash scripts/onchip_watch3.sh [max_hours]
set -u
cd "$(dirname "$0")/.."
MAX_HOURS="${1:-11}"
LOG=/tmp/onchip_r3.log
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))
# cheapest, highest-value first (windows can be ~26 min total)
STAGES="bench profile trace sweep tests bench1m train30k benchckpt"

echo "[watch3] start $(date -u +%H:%M:%S) max_hours=$MAX_HOURS" | tee -a "$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    remaining=""
    for s in $STAGES; do
        [ -f "/tmp/onchip_done_$s" ] || remaining="$remaining $s"
    done
    if [ -z "$remaining" ]; then
        echo "[watch3] all stages done at $(date -u +%H:%M:%S)" | tee -a "$LOG"
        exit 0
    fi
    if timeout 120 python -c "import jax; print(jax.devices())" >>"$LOG" 2>&1; then
        echo "[watch3] TPU UP at $(date -u +%H:%M:%S); remaining:$remaining" | tee -a "$LOG"
        for s in $remaining; do
            echo "[watch3] stage $s start $(date -u +%H:%M:%S)" | tee -a "$LOG"
            bash scripts/onchip_r2.sh "$s" >>"$LOG" 2>&1
            rc=$?
            echo "[watch3] stage $s rc=$rc at $(date -u +%H:%M:%S)" | tee -a "$LOG"
            if [ $rc -eq 0 ]; then
                touch "/tmp/onchip_done_$s"
                bash scripts/onchip_collect.sh "$s" >>"$LOG" 2>&1 || true
            else
                # partial artifacts are still worth preserving (e.g. a
                # sweep that finished 3 of 5 combos before a flap)
                bash scripts/onchip_collect.sh "$s" >>"$LOG" 2>&1 || true
                break  # tunnel likely flapped; re-probe before continuing
            fi
        done
    else
        echo "[watch3] down at $(date -u +%H:%M:%S)" >>"$LOG"
    fi
    sleep 160
done
echo "[watch3] deadline reached" | tee -a "$LOG"
exit 2
