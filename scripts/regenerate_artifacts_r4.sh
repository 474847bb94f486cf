#!/usr/bin/env bash
# Round-4 additions to the artifact regeneration (run AFTER
# regenerate_artifacts.sh): backbone-parity arm, accelerator-gated
# trainability regression, protocol-scale multiview measurement, training
# dashboards, and the README re-render. Same resumability contract.
set -euo pipefail
cd "$(dirname "$0")/.."

TRAIN="python -m cosypose_tpu.scripts.run_pose_training"
ACC="python -m cosypose_tpu.scripts.run_procedural_accuracy"

train_resumable() {
    local cli="$1" config="$2"; shift 2
    local attempt
    for attempt in 1 2 3 4; do
        if [ -d "local_data/experiments/$config/checkpoint" ]; then
            $cli --config "$config" --resume "$@" && return 0
        else
            $cli --config "$config" "$@" && return 0
        fi
        echo "training $config failed (attempt $attempt), retrying" >&2
        sleep 20
    done
    return 1
}

retry() {
    local attempt
    for attempt in 1 2 3; do
        "$@" && return 0
        echo "command failed (attempt $attempt): $*" >&2
        sleep 20
    done
    return 1
}

sync_results() {
    cp -v local_data/results/*.json results/ 2>/dev/null || true
    for d in local_data/results/bop-*/; do
        [ -d "$d" ] || continue
        mkdir -p "results/$(basename "$d")"
        cp -v "$d"metrics-*.json "results/$(basename "$d")/" 2>/dev/null || true
    done
}

# ---- 1. accelerator-gated trainability regression (VERDICT r3 weak #6) ------
# needs recorded procedural-canon (regenerate_artifacts.sh step 3)
retry bash scripts/run_tpu_gated_tests.sh

# ---- 2. backbone-parity arm: B3 at the WRN18 arm's exact budget -------------
# the accuracy half of the flagship-selection argument (VERDICT r3 #6b)
train_resumable "$TRAIN" procedural-diag-lr0.003-solo-b3
retry $ACC --run-id procedural-diag-lr0.003-solo-b3 --n-frames 150 --n-iterations 4
sync_results

# ---- 3. protocol-scale multiview measurement (VERDICT r3 #4) ----------------
# 8 views / 12 objects / 2000 RANSAC iterations — the reference's
# run_custom_scenario.py:94-180 protocol scale
retry python -m cosypose_tpu.scripts.bench_multiview \
    --n-views 8 --n-objects 12 --ransac-iter 2000 \
    --json local_data/results/bench-multiview-protocol.json
sync_results

# ---- 3b. composed pipeline + depth ICP arm (recorded depth -> ICPRefiner) ---
retry python -m cosypose_tpu.scripts.run_bop_inference --dataset procedural \
    --inference-ds synthetic.procedural-solo.val \
    --detector detector-procedural-all \
    --coarse procedural-diag-lr0.003-solo-coarse \
    --refiner procedural-diag-lr0.003-solo --icp
sync_results

# ---- 4. training dashboards from the regenerated runs (VERDICT r3 #8) -------
python -m cosypose_tpu.scripts.make_dashboard \
    procedural-diag-lr0.003-solo procedural-diag-lr0.003-solo-rot-ep40 \
    procedural-diag-lr0.003-solo-coarse procedural-diag-lr0.003-solo-b3 \
    procedural-refiner-mini \
    --out docs/dashboard.html

# ---- 5. re-render every README block from the fresh artifacts ---------------
python -m cosypose_tpu.scripts.render_readme_tables

# ---- 6. roofline levers (VERDICT r3 #6): measured, win or dead end ----------
mkdir -p local_data/results/roofline
retry python -m cosypose_tpu.scripts.bench_stages --batch 128 \
    --backbone efficientnet-b3 --json local_data/results/roofline/b3-b128.json
retry python -m cosypose_tpu.scripts.bench_stages --batch 128 \
    --backbone efficientnet-b3+dwdense \
    --json local_data/results/roofline/b3-dwdense-b128.json
retry python -m cosypose_tpu.scripts.bench_stages --batch 256 \
    --backbone efficientnet-b3 --json local_data/results/roofline/b3-b256.json
retry python -m cosypose_tpu.scripts.bench_stages --batch 128 \
    --backbone wide-resnet18 --json local_data/results/roofline/wrn18-b128.json
echo "r4 regeneration complete"
