#!/bin/bash
# Round-2 on-chip sequence: run when the TPU (axon) is reachable.
# Usage: bash scripts/onchip_r2.sh [stage]
#   stage: tests | profile | bench | train30k | all (default)
set -u
cd "$(dirname "$0")/.."
STAGE="${1:-all}"

probe() {
    timeout 120 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

if ! probe; then
    echo "TPU unreachable (jax.devices() hung)"; exit 2
fi

run_tests() {
    echo "== on-chip kernel tests =="
    # no -x: one tolerance failure (e.g. bf16x3 on the real MXU) must not
    # hide the rest of the suite's on-chip results
    WEBDGS_TEST_TPU=1 timeout 1800 python -m pytest \
        tests/test_render_forward.py tests/test_gradients.py \
        tests/test_tile_loss.py -q 2>&1 | tee /tmp/tests_r3.txt
    return ${PIPESTATUS[0]}
}

run_profile() {
    echo "== stage profile =="
    timeout 1200 python scripts/profile_breakdown.py 2>&1 \
        | tee /tmp/profile_r3.txt
    return ${PIPESTATUS[0]}
}

run_trace() {
    # op-level xplane trace of the full step; the .xplane.pb persists under
    # /tmp/jaxtrace_r3 for offline re-analysis after the tunnel drops
    echo "== op-level trace =="
    timeout 900 python scripts/trace_step.py /tmp/jaxtrace_r3 2>&1 \
        | tee /tmp/trace_r3.txt
    return ${PIPESTATUS[0]}
}

run_bench() {
    echo "== headline bench =="
    timeout 1200 python bench.py | tee /tmp/bench_r3_headline.json
    return ${PIPESTATUS[0]}
}

run_bench1m() {
    echo "== 1M-splat scale point =="
    timeout 1800 python scripts/bench_1m.py 2>&1 | tee /tmp/bench1m_r3.txt
    return ${PIPESTATUS[0]}
}

run_sweep() {
    # chunk x tile sweep of the headline bench; one JSONL line per combo in
    # /tmp/sweep_r3.jsonl, combos already present are skipped so a tunnel
    # flap mid-sweep resumes instead of restarting
    echo "== chunk/tile sweep =="
    SW=/tmp/sweep_r3.jsonl
    touch "$SW"
    rc=0
    for combo in 128:16x16 256:16x16 512:16x16 128:32x16 256:32x16; do
        chunk="${combo%%:*}"; tile="${combo##*:}"
        grep -q "\"chunk\": $chunk, \"tile\": \"$tile\"" "$SW" && continue
        echo "-- chunk=$chunk tile=$tile"
        if ! WEBDGS_BENCH_CHUNK=$chunk WEBDGS_BENCH_TILE=$tile \
            timeout 900 python bench.py >> "$SW"; then rc=1; break; fi
    done
    cat "$SW"
    return $rc
}

run_train30k() {
    echo "== 30k real-format dataset run =="
    test -d /tmp/scene1/sparse || python scripts/make_synthetic_colmap.py \
        /tmp/scene1 --views 48 --width 400 --height 300
    # resume from the periodic checkpoint if a previous window got partway
    RESUME=""
    test -f /tmp/scene1/ck30k.npz && RESUME="--resume /tmp/scene1/ck30k.npz"
    timeout 7200 python -m webdgs_tpu.cli train \
        --points /tmp/scene1/sparse/0/points3D.bin \
        --cameras /tmp/scene1/sparse/0/images.bin /tmp/scene1/sparse/0/cameras.bin \
        --images /tmp/scene1/images \
        --iterations 30000 --log-every 1000 --holdout-every 8 \
        --checkpoint-every 2000 $RESUME \
        --out /tmp/scene1/ck30k.npz --export-ply /tmp/scene1/trained30k.ply \
        --width 400 --height 300 2>&1 | tee -a /tmp/train30k_r3.txt
    return ${PIPESTATUS[0]}
}

run_bench_ckpt() {
    echo "== trained-scene bench (needs ck30k from train30k) =="
    test -f /tmp/scene1/ck30k.npz || { echo "no checkpoint yet"; return 0; }
    WEBDGS_BENCH_CHECKPOINT=/tmp/scene1/ck30k.npz timeout 1200 \
        python bench.py | tee /tmp/bench_r3_trained.json
    return ${PIPESTATUS[0]}
}

case "$STAGE" in
    tests) run_tests ;;
    profile) run_profile ;;
    trace) run_trace ;;
    bench) run_bench ;;
    bench1m) run_bench1m ;;
    sweep) run_sweep ;;
    train30k) run_train30k ;;
    benchckpt) run_bench_ckpt ;;
    all)
        # Cheapest, highest-value first: windows can be ~26 min total.
        # Non-fatal sequencing; report every rc at the end.
        run_bench;   rc_bench=$?
        run_profile; rc_profile=$?
        run_trace;   rc_trace=$?
        run_sweep;   rc_sweep=$?
        run_tests;   rc_tests=$?
        run_bench1m; rc_1m=$?
        run_train30k; rc_30k=$?
        run_bench_ckpt
        echo "RCs: bench=$rc_bench profile=$rc_profile trace=$rc_trace sweep=$rc_sweep tests=$rc_tests bench1m=$rc_1m train30k=$rc_30k"
        # every collected rc participates, so a watcher driving stage=all
        # retries a window where only sweep/bench1m/train30k failed
        exit $(( rc_bench | rc_profile | rc_trace | rc_sweep | rc_1m \
                 | rc_tests | rc_30k ))
        ;;
    *) echo "unknown stage $STAGE"; exit 1 ;;
esac
