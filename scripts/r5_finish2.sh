#!/usr/bin/env bash
# Round-5 last stage: measured z-loss lever arm + equal-budget B3 point +
# dashboards/README. Runs after r5_finish.sh (WAIT_PID).
set -uo pipefail
cd "$(dirname "$0")/.."

WAIT_PID="${WAIT_PID:-}"
if [ -n "$WAIT_PID" ]; then
    echo "waiting for pid=$WAIT_PID"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

TRAIN="python -m cosypose_tpu.scripts.run_pose_training"
ACC="python -m cosypose_tpu.scripts.run_procedural_accuracy"
ZW_ARM="procedural-diag-lr0.003-solo-zw3-devaug-ep20"
B3_EQ="procedural-diag-lr0.003-solo-b3-dc0-devaug-ep20"

step() { echo "==== [$(date +%H:%M:%S)] $*"; }

sync_results() {
    cp -v local_data/results/*.json results/ 2>/dev/null || true
    for d in local_data/results/bop-*/ local_data/results/detection-*/; do
        [ -d "$d" ] || continue
        mkdir -p "results/$(basename "$d")"
        cp -v "$d"*.json "results/$(basename "$d")/" 2>/dev/null || true
    done
}

# ---- z-loss lever arm (diag_z: z is the low-SNR head; zw3 prioritizes it) ----
step "z lever arm: $ZW_ARM"
if [ -d "local_data/experiments/$ZW_ARM/checkpoint" ]; then
    timeout 3000 $TRAIN --config "$ZW_ARM" --resume --no-eval-bundle || true
else
    timeout 3000 $TRAIN --config "$ZW_ARM" --no-eval-bundle || true
fi
timeout 1800 $ACC --run-id "$ZW_ARM" --n-frames 150 --n-iterations 4 || true
sync_results

# ---- equal-budget B3 point for the flagship table ------------------------------
step "equal-budget B3: $B3_EQ"
if [ -d "local_data/experiments/$B3_EQ/checkpoint" ]; then
    timeout 2400 $TRAIN --config "$B3_EQ" --resume --no-eval-bundle || true
else
    timeout 2400 $TRAIN --config "$B3_EQ" --no-eval-bundle || true
fi
timeout 1800 $ACC --run-id "$B3_EQ" --n-frames 150 --n-iterations 4 || true
sync_results

# ---- dashboards + README -------------------------------------------------------
step "dashboards + README render"
python -m cosypose_tpu.scripts.make_dashboard \
    procedural-diag-lr0.003-solo-b3-dc0-devaug-ep40 \
    procedural-diag-lr0.003-texsolo-coarse-flat-lev0.25-hi0.01-it2-devaug \
    procedural-diag-lr0.003-texsolo-rot-flat-lk-lev0.25-hi0.01-ep40-devaug \
    --out docs/dashboard.html || true
python -m cosypose_tpu.scripts.render_readme_tables || true
step "r5 finish2 complete"
