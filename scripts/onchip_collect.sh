#!/bin/bash
# Preserve on-chip capture artifacts in git so a TPU window that happens
# while no session is attached still delivers its results to the repo.
# Called by onchip_watch3.sh after each successful stage; safe to re-run.
# Usage: bash scripts/onchip_collect.sh <stage>
set -u
cd "$(dirname "$0")/.."
STAGE="${1:-unknown}"
DEST=onchip_r3
mkdir -p "$DEST"

copy() {  # copy <src> <dst-name> if the source exists and is non-empty
    [ -s "$1" ] && cp "$1" "$DEST/$2"
}

case "$STAGE" in
    bench)    copy /tmp/bench_r3_headline.json bench_headline.json ;;
    profile)  copy /tmp/profile_r3.txt profile_breakdown.txt ;;
    trace)    copy /tmp/trace_r3.txt trace_ops.txt ;;
    sweep)    copy /tmp/sweep_r3.jsonl sweep.jsonl ;;
    tests)    copy /tmp/tests_r3.txt tests_onchip.txt ;;
    bench1m)  copy /tmp/bench1m_r3.txt bench_1m.txt ;;
    train30k)
        copy /tmp/train30k_r3.txt train30k_log.txt
        # the checkpoint/PLY are large binaries; keep only the eval tail
        ;;
    benchckpt) copy /tmp/bench_r3_trained.json bench_trained.json ;;
esac

if ! git diff --quiet -- "$DEST" 2>/dev/null || \
   [ -n "$(git status --porcelain -- "$DEST")" ]; then
    git add "$DEST"
    git commit -q -m "On-chip capture: $STAGE results ($(date -u +%H:%M))" \
        -- "$DEST" && echo "[collect] committed $STAGE artifacts"
fi
exit 0
