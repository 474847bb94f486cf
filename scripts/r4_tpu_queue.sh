#!/usr/bin/env bash
# Round-4 TPU queue: rotation arm -> coarse arm -> detector -> composed AR.
# Value-ordered, resumable (train_resumable skips/resumes finished runs);
# recordings are produced in parallel by scripts/r4_recordings.sh.
set -uo pipefail
cd "$(dirname "$0")/.."

ROT_ARM="${ROT_ARM:-procedural-diag-lr0.003-solo-rot-flat-lev0.25-hi0.01-ep40}"
COARSE_ARM="${COARSE_ARM:-procedural-diag-lr0.003-solo-coarse-flat-lev0.25-hi0.01}"

TRAIN="python -m cosypose_tpu.scripts.run_pose_training"
DET="python -m cosypose_tpu.scripts.run_detector_training"
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
    mkdir -p results/roofline
    cp -v local_data/results/roofline/*.json results/roofline/ 2>/dev/null || true
}

# ---- 1. coarse arm: rotation from the ~120deg z-up box init (VERDICT #2b) ---
train_resumable "$TRAIN" "$COARSE_ARM"
retry $ACC --run-id "$COARSE_ARM" --n-frames 150 --n-iterations 2
sync_results

# ---- 3. detector + detection evals (needs recordings, VERDICT #4) -----------
while [ ! -f local_data/synt_datasets/procedural-canon/split_keys.json ] || \
      [ ! -f local_data/synt_datasets/procedural-4k/split_keys.json ]; do
    echo "waiting for recordings..."; sleep 60
done
train_resumable "$DET" detector-procedural-all --n-epochs 60
retry python -m cosypose_tpu.scripts.run_detection_eval \
    --dataset synthetic.procedural-solo.val \
    --detector detector-procedural-all --object-ds procedural --masks
retry python -m cosypose_tpu.scripts.run_detection_eval \
    --dataset synthetic.procedural-4k.val \
    --detector detector-procedural-all --object-ds procedural --masks
sync_results

# ---- 4. composed det -> coarse -> refiner BOP19 AR (VERDICT #1) --------------
retry python -m cosypose_tpu.scripts.run_bop_inference --dataset procedural \
    --inference-ds synthetic.procedural-solo.val \
    --detector detector-procedural-all \
    --coarse "$COARSE_ARM" \
    --refiner procedural-diag-lr0.003-solo
sync_results
retry python -m cosypose_tpu.scripts.run_bop_inference --dataset procedural \
    --inference-ds synthetic.procedural-solo.val \
    --detector detector-procedural-all \
    --coarse "$COARSE_ARM" \
    --refiner procedural-diag-lr0.003-solo --icp
sync_results

# ---- 5. accelerator-gated trainability regression ----------------------------
retry bash scripts/run_tpu_gated_tests.sh

# ---- 6. backbone-parity arm: B3 at the WRN18 arm's exact budget ---------------
train_resumable "$TRAIN" procedural-diag-lr0.003-solo-b3
retry $ACC --run-id procedural-diag-lr0.003-solo-b3 --n-frames 150 --n-iterations 4
sync_results

# ---- 7. protocol-scale multiview measurement ----------------------------------
retry python -m cosypose_tpu.scripts.bench_multiview \
    --n-views 8 --n-objects 12 --ransac-iter 2000 \
    --json local_data/results/bench-multiview-protocol.json
sync_results

# ---- 8. roofline levers -------------------------------------------------------
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
sync_results

# ---- 9. dashboards + README re-render -----------------------------------------
python -m cosypose_tpu.scripts.make_dashboard \
    procedural-diag-lr0.003-solo "$ROT_ARM" "$COARSE_ARM" \
    --out docs/dashboard.html || true
python -m cosypose_tpu.scripts.render_readme_tables || true
echo "r4 TPU queue complete"
