#!/bin/bash
# Round-5 on-chip capture: one stage per invocation, artifacts into
# onchip_r5/.  Stages map to VERDICT r4 "next round" tasks:
#   bench     - headline 100k/800x600 (task 1)
#   trace     - op timeline at HEAD, re-ranks the perf residue (task 2)
#   tests     - on-chip kernel suite (task 1)
#   bench1m   - 1M/2M/4M scale points at HEAD (task 8)
#   shard1    - dp/gs sharded step on a 1-device mesh vs plain (task 4)
#   train30k  - 400x300 30k run -> checkpoint (feeds benchckpt)
#   denstrace - densify-event cost trace inside a short run (task 5)
#   benchckpt - trained-scene bench from the 30k checkpoint (task 1)
#   band4k    - one real 3840x2160 banded frame, wall time (task 6)
#   train800  - 800x600 30k quality run, >=25 dB holdout (task 3)
#   f16delta  - grad_rows_f16 on/off quality delta, short runs (task 3)
# Usage: bash scripts/onchip_r5.sh <stage>
set -u
cd "$(dirname "$0")/.."
STAGE="${1:?stage}"
DEST=onchip_r5
mkdir -p "$DEST"

case "$STAGE" in
bench)
    timeout 1500 python bench.py > "$DEST/bench_headline.json" \
        2> "$DEST/bench_headline.err"
    cat "$DEST/bench_headline.json" ;;
trace)
    timeout 1200 python scripts/trace_step.py /tmp/jaxtrace_r5 \
        > "$DEST/trace_ops.txt" 2>&1
    timeout 600 python scripts/trace_timeline.py /tmp/jaxtrace_r5 \
        > "$DEST/trace_timeline.txt" 2>&1
    tail -40 "$DEST/trace_ops.txt" ;;
tests)
    WEBDGS_TEST_TPU=1 timeout 2700 python -m pytest \
        tests/test_render_forward.py tests/test_gradients.py \
        tests/test_tile_loss.py tests/test_banded_render.py -q \
        > "$DEST/tests_onchip.txt" 2>&1
    tail -3 "$DEST/tests_onchip.txt" ;;
bench1m)
    : > "$DEST/bench_1m.txt"
    for N in 1000000 2000000 4000000; do
        echo "=== N=$N ===" >> "$DEST/bench_1m.txt"
        WEBDGS_BENCH_N=$N timeout 2400 python scripts/bench_1m.py \
            >> "$DEST/bench_1m.txt" 2>&1
    done
    tail -30 "$DEST/bench_1m.txt" ;;
shard1)
    timeout 1800 python scripts/bench_shard1.py > "$DEST/shard1.txt" 2>&1
    tail -10 "$DEST/shard1.txt" ;;
train30k)
    test -d /tmp/scene1/sparse || python scripts/make_synthetic_colmap.py \
        /tmp/scene1 --views 48 --width 400 --height 300
    RESUME=""
    test -f /tmp/scene1/ck30k.npz && RESUME="--resume /tmp/scene1/ck30k.npz"
    timeout 7200 python -m webdgs_tpu.cli train \
        --points /tmp/scene1/sparse/0/points3D.bin \
        --cameras /tmp/scene1/sparse/0/images.bin /tmp/scene1/sparse/0/cameras.bin \
        --images /tmp/scene1/images \
        --iterations 30000 --log-every 1000 --holdout-every 8 \
        --checkpoint-every 2000 $RESUME \
        --out /tmp/scene1/ck30k.npz --export-ply /tmp/scene1/trained30k.ply \
        --width 400 --height 300 > "$DEST/train30k_log.txt" 2>&1
    tail -5 "$DEST/train30k_log.txt" ;;
denstrace)
    timeout 2400 python scripts/trace_densify.py > "$DEST/denstrace.txt" 2>&1
    tail -20 "$DEST/denstrace.txt" ;;
benchckpt)
    test -f /tmp/scene1/ck30k.npz || { echo "no checkpoint yet"; exit 1; }
    WEBDGS_BENCH_CHECKPOINT=/tmp/scene1/ck30k.npz timeout 1500 \
        python bench.py > "$DEST/bench_trained.json" 2>> "$DEST/bench_headline.err"
    cat "$DEST/bench_trained.json" ;;
band4k)
    timeout 1800 python scripts/bench_band4k.py > "$DEST/band4k.txt" 2>&1
    cat "$DEST/band4k.txt" | tail -10 ;;
train800)
    test -d /tmp/scene8/sparse || python scripts/make_synthetic_colmap.py \
        /tmp/scene8 --views 48 --width 800 --height 600
    RESUME=""
    test -f /tmp/scene8/ck30k.npz && RESUME="--resume /tmp/scene8/ck30k.npz"
    timeout 10800 python -m webdgs_tpu.cli train \
        --points /tmp/scene8/sparse/0/points3D.bin \
        --cameras /tmp/scene8/sparse/0/images.bin /tmp/scene8/sparse/0/cameras.bin \
        --images /tmp/scene8/images \
        --iterations 30000 --log-every 1000 --holdout-every 8 \
        --checkpoint-every 2000 $RESUME \
        --out /tmp/scene8/ck30k.npz --export-ply /tmp/scene8/trained800.ply \
        --width 800 --height 600 > "$DEST/train800_log.txt" 2>&1
    tail -5 "$DEST/train800_log.txt" ;;
f16delta)
    timeout 7200 python scripts/exp_f16_quality.py > "$DEST/f16delta.txt" 2>&1
    tail -10 "$DEST/f16delta.txt" ;;
*) echo "unknown stage $STAGE"; exit 1 ;;
esac
