#!/bin/bash
# Round-3 resumable on-chip capture: probe the axon tunnel every ~3 min from
# FRESH subprocesses (a wedged init never recovers).  When the chip answers,
# run the staged sequence ONE STAGE AT A TIME, marking each successful stage
# done (/tmp/onchip_done_<stage>); a tunnel flap mid-sequence only loses the
# current stage — the next window resumes from the first incomplete stage
# instead of restarting (or worse, exiting after one attempt).
#
# Usage: bash scripts/onchip_watch2.sh [max_hours]
set -u
cd "$(dirname "$0")/.."
MAX_HOURS="${1:-11}"
LOG=/tmp/onchip_r3.log
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))
# cheapest, highest-value first (windows can be ~26 min total)
STAGES="bench profile trace sweep tests bench1m train30k benchckpt"

echo "[watch2] start $(date -u +%H:%M:%S) max_hours=$MAX_HOURS" | tee -a "$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    remaining=""
    for s in $STAGES; do
        [ -f "/tmp/onchip_done_$s" ] || remaining="$remaining $s"
    done
    if [ -z "$remaining" ]; then
        echo "[watch2] all stages done at $(date -u +%H:%M:%S)" | tee -a "$LOG"
        exit 0
    fi
    if timeout 120 python -c "import jax; print(jax.devices())" >>"$LOG" 2>&1; then
        echo "[watch2] TPU UP at $(date -u +%H:%M:%S); remaining:$remaining" | tee -a "$LOG"
        for s in $remaining; do
            echo "[watch2] stage $s start $(date -u +%H:%M:%S)" | tee -a "$LOG"
            bash scripts/onchip_r2.sh "$s" >>"$LOG" 2>&1
            rc=$?
            echo "[watch2] stage $s rc=$rc at $(date -u +%H:%M:%S)" | tee -a "$LOG"
            if [ $rc -eq 0 ]; then
                touch "/tmp/onchip_done_$s"
            else
                break  # tunnel likely flapped; re-probe before continuing
            fi
        done
    else
        echo "[watch2] down at $(date -u +%H:%M:%S)" >>"$LOG"
    fi
    sleep 160
done
echo "[watch2] deadline reached" | tee -a "$LOG"
exit 2
