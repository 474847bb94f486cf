#!/usr/bin/env bash
# Round-5 TPU queue (VERDICT r4 items, value-ordered):
#   1. B3 learning-dynamics probes (ep8 bisect: devaug baseline / dc0 /
#      fp32 / hi0.01 / aux0.3 / lr0.001)          [VERDICT #1 flagship]
#   2. detector-procedural-all2: softmax classifier + 32 protos +
#      texsolo tier + detection evals              [VERDICT #6 + #2 dep]
#   3. texsolo coarse arm with iteration-2 supervision  [VERDICT #2, #3]
#   4. texsolo refiner at 2x budget (ep40)              [VERDICT #2]
#   5. composed det->coarse->refiner BOP19 AR on the textured tier (+icp)
# Resumable: train_resumable skips/resumes finished runs.
set -uo pipefail
cd "$(dirname "$0")/.."

TRAIN="python -m cosypose_tpu.scripts.run_pose_training"
DET="python -m cosypose_tpu.scripts.run_detector_training"
ACC="python -m cosypose_tpu.scripts.run_procedural_accuracy"

TEX_COARSE="procedural-diag-lr0.003-texsolo-coarse-flat-lev0.25-hi0.01-it2-devaug"
TEX_REFINER="procedural-diag-lr0.003-texsolo-rot-flat-lk-lev0.25-hi0.01-ep40-devaug"

step() { echo "==== [$(date +%H:%M:%S)] $*"; }

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
    for d in local_data/results/bop-*/ local_data/results/detection-*/; do
        [ -d "$d" ] || continue
        mkdir -p "results/$(basename "$d")"
        cp -v "$d"*.json "results/$(basename "$d")/" 2>/dev/null || true
    done
    mkdir -p results/roofline
    cp -v local_data/results/roofline/*.json results/roofline/ 2>/dev/null || true
}

# ---- 1. B3 probes (ep8, train-loss bisect; no eval bundle) -------------------
for arm in \
    procedural-diag-lr0.003-solo-b3-devaug-ep8 \
    procedural-diag-lr0.003-solo-b3-dc0-devaug-ep8 \
    procedural-diag-lr0.003-solo-b3-fp32-devaug-ep8 \
    procedural-diag-lr0.003-solo-b3-hi0.01-devaug-ep8 \
    procedural-diag-lr0.003-solo-b3-aux0.3-devaug-ep8 \
    procedural-diag-lr0.001-solo-b3-devaug-ep8; do
    step "B3 probe: $arm"
    if [ -d "local_data/experiments/$arm/checkpoint" ]; then
        timeout 2400 $TRAIN --config "$arm" --resume --no-eval-bundle || true
    else
        timeout 2400 $TRAIN --config "$arm" --no-eval-bundle || true
    fi
done
step "B3 probes done (decide winner from log.txt loss_xy curves)"

# ---- 2. detector v2 (softmax cls, 32 protos, texsolo tier) -------------------
step "detector-procedural-all2 training"
train_resumable "$DET" detector-procedural-all2 --n-epochs 90
step "detection evals (4k + texsolo)"
retry timeout 3600 python -m cosypose_tpu.scripts.run_detection_eval \
    --dataset synthetic.procedural-4k.val \
    --detector detector-procedural-all2 --object-ds procedural --masks
sync_results
retry timeout 3600 python -m cosypose_tpu.scripts.run_detection_eval \
    --dataset synthetic.procedural-texsolo.val \
    --detector detector-procedural-all2 --object-ds procedural-tex --masks
sync_results

# ---- 3. texsolo coarse (iteration-2 supervision) ------------------------------
step "texsolo coarse: $TEX_COARSE"
train_resumable "$TRAIN" "$TEX_COARSE"
retry timeout 1800 $ACC --run-id "$TEX_COARSE" --n-frames 150 --n-iterations 2
sync_results

# ---- 4. texsolo refiner at 2x budget ------------------------------------------
step "texsolo refiner: $TEX_REFINER"
train_resumable "$TRAIN" "$TEX_REFINER"
retry timeout 1800 $ACC --run-id "$TEX_REFINER" --n-frames 150 --n-iterations 4
sync_results

# ---- 5. composed BOP19 AR on the textured tier ---------------------------------
step "composed texsolo AR"
retry timeout 3600 python -m cosypose_tpu.scripts.run_bop_inference \
    --dataset procedural --inference-ds synthetic.procedural-texsolo.val \
    --detector detector-procedural-all2 \
    --coarse "$TEX_COARSE" --refiner "$TEX_REFINER"
sync_results
step "composed texsolo AR (+icp)"
retry timeout 3600 python -m cosypose_tpu.scripts.run_bop_inference \
    --dataset procedural --inference-ds synthetic.procedural-texsolo.val \
    --detector detector-procedural-all2 \
    --coarse "$TEX_COARSE" --refiner "$TEX_REFINER" --icp
sync_results

step "r5 TPU queue (stages 1-5) complete"
