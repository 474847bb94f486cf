#!/usr/bin/env bash
# Round-4 finishing queue (supersedes r4_tpu_queue.sh mid-flight).
# Order = remaining VERDICT r3 value: detection evals + composed AR (#1,#4),
# texsolo rotation arm (#2a), refiner-mini for the eval-pipeline regression,
# accelerator-gated tests (#7), protocol multiview (#5), roofline (#6),
# dashboard/README re-render (#3,#8). Every step is timeout-bounded so the
# round cannot hang on a single stage; results sync to results/ eagerly.
set -uo pipefail
cd "$(dirname "$0")/.."

COARSE_ARM=procedural-diag-lr0.003-solo-coarse-flat-lev0.25-hi0.01
TEXROT_ARM=procedural-diag-lr0.003-texsolo-rot-flat-lk-lev0.25-hi0.01-ep20
DET_PID="${DET_PID:-}"

sync_results() {
    cp -v local_data/results/*.json results/ 2>/dev/null || true
    for d in local_data/results/bop-*/; do
        [ -d "$d" ] || continue
        mkdir -p "results/$(basename "$d")"
        cp -v "$d"metrics-*.json "results/$(basename "$d")/" 2>/dev/null || true
    done
    for d in local_data/results/detection-*/; do
        [ -d "$d" ] || continue
        mkdir -p "results/$(basename "$d")"
        cp -v "$d"*.json "results/$(basename "$d")/" 2>/dev/null || true
    done
    mkdir -p results/roofline
    cp -v local_data/results/roofline/*.json results/roofline/ 2>/dev/null || true
}

step() { echo "==== [$(date +%H:%M:%S)] $*"; }

# ---- 0. cap the running detector training at epoch 45 (diminishing loss
# returns vs the remaining round budget) and wait for it to exit ------------
if [ -n "$DET_PID" ]; then
    step "watching detector pid=$DET_PID until epoch_00045"
    while kill -0 "$DET_PID" 2>/dev/null; do
        if [ -d local_data/experiments/detector-procedural-all/checkpoint/epoch_00045 ]; then
            step "epoch 45 reached; stopping detector"
            kill "$DET_PID" 2>/dev/null || true
        fi
        sleep 10
    done
    sleep 5
fi

# ---- 1. detection evals: box + mask metrics on both held-out sets ---------
step "detection eval (solo)"
timeout 1200 python -m cosypose_tpu.scripts.run_detection_eval \
    --dataset synthetic.procedural-solo.val \
    --detector detector-procedural-all --object-ds procedural --masks
step "detection eval (4k)"
timeout 1200 python -m cosypose_tpu.scripts.run_detection_eval \
    --dataset synthetic.procedural-4k.val \
    --detector detector-procedural-all --object-ds procedural --masks
sync_results

# ---- 2. composed det -> coarse -> refiner BOP19 AR -------------------------
step "composed BOP19 AR"
timeout 1800 python -m cosypose_tpu.scripts.run_bop_inference --dataset procedural \
    --inference-ds synthetic.procedural-solo.val \
    --detector detector-procedural-all \
    --coarse "$COARSE_ARM" \
    --refiner procedural-diag-lr0.003-solo
sync_results
step "composed BOP19 AR (+icp)"
timeout 1800 python -m cosypose_tpu.scripts.run_bop_inference --dataset procedural \
    --inference-ds synthetic.procedural-solo.val \
    --detector detector-procedural-all \
    --coarse "$COARSE_ARM" \
    --refiner procedural-diag-lr0.003-solo --icp
sync_results

# ---- 3. texsolo rotation arm: the rotation-refinement demonstration --------
step "texsolo rotation arm training"
timeout 2400 python -m cosypose_tpu.scripts.run_pose_training --config "$TEXROT_ARM"
step "texsolo rotation accuracy eval"
timeout 900 python -m cosypose_tpu.scripts.run_procedural_accuracy \
    --run-id "$TEXROT_ARM" --n-frames 48 --n-iterations 4
sync_results

# ---- 4. refiner-mini (eval-pipeline gated regression artifact) --------------
step "refiner-mini training (20 epochs)"
timeout 1500 python -m cosypose_tpu.scripts.run_pose_training \
    --config procedural-refiner-mini --n-epochs 20
step "refiner-mini accuracy eval"
timeout 900 python -m cosypose_tpu.scripts.run_procedural_accuracy \
    --run-id procedural-refiner-mini --n-frames 20 --n-iterations 2
sync_results

# ---- 5. accelerator-gated trainability regression ---------------------------
step "TPU-gated tests"
timeout 1800 bash scripts/run_tpu_gated_tests.sh || true

# ---- 6. protocol-scale multiview measurement --------------------------------
step "protocol multiview bench"
timeout 1200 python -m cosypose_tpu.scripts.bench_multiview \
    --n-views 8 --n-objects 12 --ransac-iter 2000 \
    --json local_data/results/bench-multiview-protocol.json
sync_results

# ---- 7. roofline levers ------------------------------------------------------
mkdir -p local_data/results/roofline
step "roofline b3-b128"
timeout 900 python -m cosypose_tpu.scripts.bench_stages --batch 128 \
    --backbone efficientnet-b3 --json local_data/results/roofline/b3-b128.json || true
step "roofline b3-dwdense-b128"
timeout 900 python -m cosypose_tpu.scripts.bench_stages --batch 128 \
    --backbone efficientnet-b3+dwdense \
    --json local_data/results/roofline/b3-dwdense-b128.json || true
step "roofline b3-b256"
timeout 900 python -m cosypose_tpu.scripts.bench_stages --batch 256 \
    --backbone efficientnet-b3 --json local_data/results/roofline/b3-b256.json || true
step "roofline wrn18-b128"
timeout 900 python -m cosypose_tpu.scripts.bench_stages --batch 128 \
    --backbone wide-resnet18 --json local_data/results/roofline/wrn18-b128.json || true
sync_results

# ---- 8. dashboards + README re-render ----------------------------------------
step "dashboard + README tables"
python -m cosypose_tpu.scripts.make_dashboard \
    procedural-diag-lr0.003-solo "$TEXROT_ARM" "$COARSE_ARM" \
    --out docs/dashboard.html || true
python -m cosypose_tpu.scripts.render_readme_tables || true
step "r4 finishing queue complete"
