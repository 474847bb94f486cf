#!/usr/bin/env bash
# Round-4 leftovers queue: runs after r4_finish.sh exits.
#   0. texsolo rotation arm: resume to the full 20 epochs if the first
#      queue's 2400s bound cut the training short, then re-eval
#   1. detection eval on the solo val set (box+mask)  [first try hit 1200s]
#   2. composed AR +icp metrics JSON                  [needed ~31min, had 30]
#   3. B3 backbone-parity arm (flagship-selection accuracy argument)
#   4. README re-render + artifact sync
set -uo pipefail
cd "$(dirname "$0")/.."

WAIT_PID="${WAIT_PID:-}"
if [ -n "$WAIT_PID" ]; then
    echo "waiting for queue pid=$WAIT_PID"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

TEX_ARM=procedural-diag-lr0.003-texsolo-rot-flat-lk-lev0.25-hi0.01-ep20
B3_ARM=procedural-diag-lr0.003-solo-b3

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

# ---- 0. texsolo completion insurance ---------------------------------------
if [ -d "local_data/experiments/$TEX_ARM/checkpoint" ] && \
   [ ! -d "local_data/experiments/$TEX_ARM/checkpoint/epoch_00019" ] && \
   [ ! -d "local_data/experiments/$TEX_ARM/checkpoint/epoch_00020" ]; then
    step "texsolo cut short; resuming to 20 epochs"
    timeout 1800 python -m cosypose_tpu.scripts.run_pose_training \
        --config "$TEX_ARM" --resume "$TEX_ARM"
    step "texsolo re-eval"
    timeout 900 python -m cosypose_tpu.scripts.run_procedural_accuracy \
        --run-id "$TEX_ARM" --n-frames 48 --n-iterations 4
    sync_results
fi

# ---- 1. detection evals with the calibrated mask threshold -------------------
step "detection eval (solo, calibrated mask-th)"
timeout 2700 python -m cosypose_tpu.scripts.run_detection_eval \
    --dataset synthetic.procedural-solo.val \
    --detector detector-procedural-all --object-ds procedural --masks
sync_results
step "detection eval (4k, calibrated mask-th)"
timeout 2700 python -m cosypose_tpu.scripts.run_detection_eval \
    --dataset synthetic.procedural-4k.val \
    --detector detector-procedural-all --object-ds procedural --masks
sync_results

# ---- 2. composed AR +icp ------------------------------------------------------
step "composed BOP19 AR (+icp, 2nd attempt)"
timeout 3000 python -m cosypose_tpu.scripts.run_bop_inference --dataset procedural \
    --inference-ds synthetic.procedural-solo.val \
    --detector detector-procedural-all \
    --coarse procedural-diag-lr0.003-solo-coarse-flat-lev0.25-hi0.01 \
    --refiner procedural-diag-lr0.003-solo --icp
sync_results

# ---- 3. B3 backbone-parity arm (same budget as the WRN18 headline arm) -------
step "B3 parity arm training"
timeout 3600 python -m cosypose_tpu.scripts.run_pose_training --config "$B3_ARM"
step "B3 parity arm eval"
timeout 1200 python -m cosypose_tpu.scripts.run_procedural_accuracy \
    --run-id "$B3_ARM" --n-frames 150 --n-iterations 4
sync_results

# ---- 3b. protocol multiview bench (device-gather scorer fix) -----------------
step "protocol multiview bench (retry with device-gather scorer)"
timeout 1800 python -m cosypose_tpu.scripts.bench_multiview \
    --n-views 8 --n-objects 12 --ransac-iter 2000 \
    --json local_data/results/bench-multiview-protocol.json
sync_results

# ---- 3c. roofline b3-b128 re-run (first run polluted by concurrent host CPU
#          load starving the tunnel client) -----------------------------------
step "roofline b3-b128 (clean re-run)"
timeout 900 python -m cosypose_tpu.scripts.bench_stages --batch 128 \
    --backbone efficientnet-b3 --json local_data/results/roofline/b3-b128.json || true
step "roofline b3-b128-lod512 (production render geometry)"
timeout 900 python -m cosypose_tpu.scripts.bench_stages --batch 128 --render-lod 512 \
    --backbone efficientnet-b3 --json local_data/results/roofline/b3-b128-lod512.json || true
step "roofline wrn18-b128-lod512"
timeout 900 python -m cosypose_tpu.scripts.bench_stages --batch 128 --render-lod 512 \
    --backbone wide-resnet18 --json local_data/results/roofline/wrn18-b128-lod512.json || true
sync_results

# ---- 4. README re-render -------------------------------------------------------
step "README re-render"
python -m cosypose_tpu.scripts.render_readme_tables || true
step "r4 leftovers queue complete"
