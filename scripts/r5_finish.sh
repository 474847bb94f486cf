#!/usr/bin/env bash
# Round-5 stage 6+: runs after r5_tpu_queue.sh exits (WAIT_PID).
#   6. B3 flagship arm with the measured drop_connect fix (probe bisect:
#      dc0 breaks the identity basin, fp32/hi0.01/baseline stay flat)
#   7. solo coarse with iteration-2 supervision (VERDICT #3) + composed
#      solo AR re-run with the new coarse
#   8. clean protocol multiview bench (new device top-k scorer) + ref row
set -uo pipefail
cd "$(dirname "$0")/.."

WAIT_PID="${WAIT_PID:-}"
if [ -n "$WAIT_PID" ]; then
    echo "waiting for queue pid=$WAIT_PID"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

TRAIN="python -m cosypose_tpu.scripts.run_pose_training"
ACC="python -m cosypose_tpu.scripts.run_procedural_accuracy"
B3_ARM="procedural-diag-lr0.003-solo-b3-dc0-devaug-ep40"
SOLO_COARSE="procedural-diag-lr0.003-solo-coarse-flat-lev0.25-hi0.01-it2-devaug"

step() { echo "==== [$(date +%H:%M:%S)] $*"; }

train_resumable() {
    local config="$1"; shift
    local attempt
    for attempt in 1 2 3 4; do
        if [ -d "local_data/experiments/$config/checkpoint" ]; then
            $TRAIN --config "$config" --resume "$@" && return 0
        else
            $TRAIN --config "$config" "$@" && return 0
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
}

# ---- 6. B3 flagship arm (drop_connect fix, 2x budget) -------------------------
step "B3 flagship arm: $B3_ARM"
train_resumable "$B3_ARM"
retry timeout 1800 $ACC --run-id "$B3_ARM" --n-frames 150 --n-iterations 4
sync_results

# ---- 7. solo coarse it2 + composed solo AR -------------------------------------
step "solo coarse it2: $SOLO_COARSE"
train_resumable "$SOLO_COARSE"
retry timeout 1800 $ACC --run-id "$SOLO_COARSE" --n-frames 150 --n-iterations 2
sync_results
step "composed solo AR with it2 coarse"
retry timeout 3600 python -m cosypose_tpu.scripts.run_bop_inference \
    --dataset procedural --inference-ds synthetic.procedural-solo.val \
    --detector detector-procedural-all2 \
    --coarse "$SOLO_COARSE" --refiner procedural-diag-lr0.003-solo
sync_results

# ---- 8. clean multiview bench (TPU idle now) -----------------------------------
step "protocol multiview bench (device top-k scorer)"
retry timeout 2400 python -m cosypose_tpu.scripts.bench_multiview \
    --n-views 8 --n-objects 12 --ransac-iter 2000 \
    --json local_data/results/bench-multiview-protocol.json
cp -v local_data/results/bench-multiview-ref-cpu.json results/ 2>/dev/null || true
sync_results

step "r5 finish queue complete"
