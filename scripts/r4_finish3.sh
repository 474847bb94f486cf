#!/usr/bin/env bash
# Round-4 final queue (value-ordered; supersedes r4_finish2 mid-flight).
# The solo detection eval launched by finish2 keeps running detached; step 0
# waits for its artifact. Then: 4k detection eval (calibrated mask-th) →
# protocol multiview (device-gather scorer) → LOD-512 rooflines → icp AR →
# B3-parity arm → README re-render.
set -uo pipefail
cd "$(dirname "$0")/.."

B3_ARM=procedural-diag-lr0.003-solo-b3
SOLO_DET=local_data/results/detection-detector-procedural-all-synthetic_procedural-solo_val.json

sync_results() {
    cp -v local_data/results/*.json results/ 2>/dev/null || true
    for d in local_data/results/bop-*/ local_data/results/detection-*/; do
        [ -d "$d" ] || continue
        mkdir -p "results/$(basename "$d")"
        cp -v "$d"*.json "results/$(basename "$d")/" 2>/dev/null || true
    done
    mkdir -p results/roofline
    cp -v local_data/results/roofline/*.json results/roofline/ 2>/dev/null || true
}

step() { echo "==== [$(date +%H:%M:%S)] $*"; }

# ---- 0. wait (bounded) for the detached solo detection eval ------------------
step "waiting for solo detection eval artifact"
for i in $(seq 1 100); do
    [ -f "$SOLO_DET" ] && break
    sleep 30
done
sync_results

# ---- 1. 4k detection eval at the calibrated mask threshold -------------------
step "detection eval (4k, calibrated mask-th)"
timeout 2700 python -m cosypose_tpu.scripts.run_detection_eval \
    --dataset synthetic.procedural-4k.val \
    --detector detector-procedural-all --object-ds procedural --masks
sync_results

# ---- 2. protocol multiview bench (device-gather scorer) ----------------------
step "protocol multiview bench"
timeout 1800 python -m cosypose_tpu.scripts.bench_multiview \
    --n-views 8 --n-objects 12 --ransac-iter 2000 \
    --json local_data/results/bench-multiview-protocol.json
sync_results

# ---- 3. LOD-512 rooflines (production render geometry) -----------------------
step "roofline b3-b128-lod512"
timeout 900 python -m cosypose_tpu.scripts.bench_stages --batch 128 --render-lod 512 \
    --backbone efficientnet-b3 --json local_data/results/roofline/b3-b128-lod512.json || true
step "roofline wrn18-b128-lod512"
timeout 900 python -m cosypose_tpu.scripts.bench_stages --batch 128 --render-lod 512 \
    --backbone wide-resnet18 --json local_data/results/roofline/wrn18-b128-lod512.json || true
sync_results

# ---- 4. composed AR +icp ------------------------------------------------------
step "composed BOP19 AR (+icp)"
timeout 3000 python -m cosypose_tpu.scripts.run_bop_inference --dataset procedural \
    --inference-ds synthetic.procedural-solo.val \
    --detector detector-procedural-all \
    --coarse procedural-diag-lr0.003-solo-coarse-flat-lev0.25-hi0.01 \
    --refiner procedural-diag-lr0.003-solo --icp
sync_results

# ---- 5. B3 backbone-parity arm ------------------------------------------------
step "B3 parity arm training"
timeout 4800 python -m cosypose_tpu.scripts.run_pose_training --config "$B3_ARM"
step "B3 parity arm eval"
timeout 1200 python -m cosypose_tpu.scripts.run_procedural_accuracy \
    --run-id "$B3_ARM" --n-frames 150 --n-iterations 4
sync_results

# ---- 6. README re-render -------------------------------------------------------
step "README re-render"
python -m cosypose_tpu.scripts.render_readme_tables || true
step "r4 final queue complete"
