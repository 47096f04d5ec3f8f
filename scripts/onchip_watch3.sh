#!/bin/bash
# Round-3 resumable on-chip capture, v3: probe from FRESH subprocesses, run
# one stage at a time with done markers (a tunnel flap resumes instead of
# restarting), commit each stage's artifacts to git (onchip_collect.sh) so a
# window that opens while no session is attached still lands results in the
# repo, and distinguish GENUINE stage failures from tunnel flaps: a stage
# that fails while the tunnel still answers is marked failed and skipped so
# it cannot starve the stages behind it (e.g. an on-chip-only test tolerance
# failure must not block bench1m/train30k forever).
#
# Usage: bash scripts/onchip_watch3.sh [max_hours]
set -u
cd "$(dirname "$0")/.."
MAX_HOURS="${1:-11}"
LOG=/tmp/onchip_r3.log
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))
# cheapest, highest-value first (windows can be ~26 min total)
STAGES="bench profile trace sweep tests bench1m train30k benchckpt"

probe() {
    timeout 120 python -c "import jax; print(jax.devices())" >>"$LOG" 2>&1
}

echo "[watch3] start $(date -u +%H:%M:%S) max_hours=$MAX_HOURS" | tee -a "$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    remaining=""
    for s in $STAGES; do
        [ -f "/tmp/onchip_done_$s" ] || [ -f "/tmp/onchip_failed_$s" ] \
            || remaining="$remaining $s"
    done
    if [ -z "$remaining" ]; then
        echo "[watch3] all stages done/failed at $(date -u +%H:%M:%S)" | tee -a "$LOG"
        exit 0
    fi
    if [ -f /tmp/onchip_pause ]; then
        # the session is editing hot code: running a stage against a
        # half-edited working tree produces garbage results (learned the
        # hard way: a mid-edit kernel signature failed a whole on-chip
        # tests stage).  rm /tmp/onchip_pause to resume.
        echo "[watch3] paused at $(date -u +%H:%M:%S)" >>"$LOG"
        sleep 60
        continue
    fi
    if probe; then
        echo "[watch3] TPU UP at $(date -u +%H:%M:%S); remaining:$remaining" | tee -a "$LOG"
        for s in $remaining; do
            [ -f /tmp/onchip_pause ] && break
            echo "[watch3] stage $s start $(date -u +%H:%M:%S)" | tee -a "$LOG"
            bash scripts/onchip_r2.sh "$s" >>"$LOG" 2>&1
            rc=$?
            echo "[watch3] stage $s rc=$rc at $(date -u +%H:%M:%S)" | tee -a "$LOG"
            # preserve whatever the stage produced, success or not
            bash scripts/onchip_collect.sh "$s" >>"$LOG" 2>&1 || true
            if [ $rc -eq 0 ]; then
                touch "/tmp/onchip_done_$s"
            elif probe; then
                # tunnel still up => the stage itself failed; record and
                # move on so later stages still get their window time
                echo "[watch3] stage $s FAILED while tunnel up; skipping" | tee -a "$LOG"
                touch "/tmp/onchip_failed_$s"
            else
                break  # tunnel flapped; re-probe before continuing
            fi
        done
    else
        echo "[watch3] down at $(date -u +%H:%M:%S)" >>"$LOG"
    fi
    sleep 160
done
echo "[watch3] deadline reached" | tee -a "$LOG"
exit 2
