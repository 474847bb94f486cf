#!/usr/bin/env bash
# Regenerate every local_data/ artifact the README and the pinned slow-tier
# regressions reference (recorded datasets, trained checkpoints, measured
# results JSONs). local_data/ is gitignored and machine-local: a fresh
# checkout (or a wiped VM) reruns this end-to-end on one TPU chip.
#
# Total budget on one v5e: ~45 min recording + ~2-4 h training + ~15 min eval.
# Every step is resumable (recording has a chunk ledger; training --resume).
set -euo pipefail
cd "$(dirname "$0")/.."

REC="python -m cosypose_tpu.scripts.run_dataset_recording"
TRAIN="python -m cosypose_tpu.scripts.run_pose_training"
DET="python -m cosypose_tpu.scripts.run_detector_training"
ACC="python -m cosypose_tpu.scripts.run_procedural_accuracy"

# ---- 1. recorded datasets (BOP layout, split_keys.json train/val) ----------
# clean single-object tier: the held-out refinement regression trains here
[ -d local_data/synt_datasets/procedural-solo ] || $REC --config procedural-solo
# canonical-appearance occlusion piles: trainability regression + mini eval
[ -d local_data/synt_datasets/procedural-canon ] || $REC --config procedural-canon --n-frames 4400
# randomized-texture occlusion piles: detector training + full-pipeline eval
[ -d local_data/synt_datasets/procedural-4k ] || \
    $REC --config procedural --n-frames 4400 --out local_data/synt_datasets/procedural-4k

# ---- 2. trained models ------------------------------------------------------
# headline: held-out refinement (README accuracy table, pinned regression)
[ -d local_data/experiments/procedural-diag-lr0.003-solo/checkpoint ] || \
    $TRAIN --config procedural-diag-lr0.003-solo
# coarse arm (box-seeded init) for the composed det->coarse->refiner pipeline
[ -d local_data/experiments/procedural-diag-lr0.003-solo-coarse/checkpoint ] || \
    $TRAIN --config procedural-diag-lr0.003-solo-coarse
# eval-pipeline checkpoint (matched-AUC + per-pair protocol smoke)
[ -d local_data/experiments/procedural-refiner-mini/checkpoint ] || \
    $TRAIN --config procedural-refiner-mini
# detector (CenterNet+YOLACT) over all three recorded tiers
[ -d local_data/experiments/detector-procedural-all/checkpoint ] || \
    $DET --config detector-procedural-all --n-epochs 60

# ---- 3. measured results (results/ holds the tracked copies) ---------------
$ACC --run-id procedural-diag-lr0.003-solo --n-frames 150 --n-iterations 4
$ACC --run-id procedural-diag-lr0.003-solo-coarse --n-frames 150 --n-iterations 2
$ACC --run-id procedural-refiner-mini --n-frames 150 --n-iterations 2
python -m cosypose_tpu.scripts.run_detection_eval \
    --dataset synthetic.procedural-4k.val \
    --detector detector-procedural-all --object-ds procedural --masks
python -m cosypose_tpu.scripts.run_detection_eval \
    --dataset synthetic.procedural-solo.val \
    --detector detector-procedural-all --object-ds procedural --masks
# full pipeline (det -> coarse -> refiner, BOP19 AR incl. native VSD):
python -m cosypose_tpu.scripts.run_bop_inference --dataset procedural \
    --inference-ds synthetic.procedural-solo.val \
    --detector detector-procedural-all \
    --coarse procedural-diag-lr0.003-solo-coarse \
    --refiner procedural-diag-lr0.003-solo
# harder 4k piles tier: box-seeded init + mini refiner
python -m cosypose_tpu.scripts.run_bop_inference --dataset procedural \
    --n-frames 150 --detector detector-procedural-all \
    --refiner procedural-refiner-mini

cp -v local_data/results/*.json results/ 2>/dev/null || true
# run_bop_inference writes per-dataset AR summaries into bop-<ds>/ subdirs
for d in local_data/results/bop-*/; do
    [ -d "$d" ] || continue
    mkdir -p "results/$(basename "$d")"
    cp -v "$d"metrics-*.json "results/$(basename "$d")/" 2>/dev/null || true
done
echo "regeneration complete; tracked copies in results/"
