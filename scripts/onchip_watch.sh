#!/bin/bash
# Round-3 opportunistic on-chip capture: probe the axon tunnel every ~3 min
# from FRESH subprocesses (a wedged init never recovers); the moment the chip
# answers, run the staged on-chip sequence and exit. Logs to /tmp/onchip_r3.log.
#
# Usage: bash scripts/onchip_watch.sh [stage] [max_hours]
set -u
cd "$(dirname "$0")/.."
STAGE="${1:-all}"
MAX_HOURS="${2:-11}"
LOG=/tmp/onchip_r3.log
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))

echo "[watch] start $(date -u +%H:%M:%S) stage=$STAGE max_hours=$MAX_HOURS" | tee -a "$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    if timeout 120 python -c "import jax; print(jax.devices())" >>"$LOG" 2>&1; then
        echo "[watch] TPU ANSWERED at $(date -u +%H:%M:%S); running stage=$STAGE" | tee -a "$LOG"
        bash scripts/onchip_r2.sh "$STAGE" >>"$LOG" 2>&1
        rc=$?
        echo "[watch] stage=$STAGE rc=$rc at $(date -u +%H:%M:%S)" | tee -a "$LOG"
        exit $rc
    fi
    echo "[watch] down at $(date -u +%H:%M:%S)" >>"$LOG"
    sleep 160
done
echo "[watch] deadline reached, TPU never answered" | tee -a "$LOG"
exit 2
