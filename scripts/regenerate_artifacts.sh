#!/usr/bin/env bash
# Regenerate every local_data/ artifact the README and the pinned slow-tier
# regressions reference (recorded datasets, trained checkpoints, measured
# results JSONs). local_data/ is gitignored and machine-local: a fresh
# checkout (or a wiped VM) reruns this end-to-end on one TPU chip.
#
# Total budget on one v5e: ~45 min recording + ~2-4 h training + ~15 min eval.
# Every step is resumable (recording has a chunk ledger; training --resume),
# and steps are ORDERED BY VALUE: the headline held-out-refinement artifact
# regenerates first, the composed det->coarse->refiner AR next, the auxiliary
# tiers last — so an interrupted run still leaves the most important numbers
# on disk. results are synced into the tracked results/ dir after every eval.
set -euo pipefail
cd "$(dirname "$0")/.."

REC="python -m cosypose_tpu.scripts.run_dataset_recording"
TRAIN="python -m cosypose_tpu.scripts.run_pose_training"
DET="python -m cosypose_tpu.scripts.run_detector_training"
ACC="python -m cosypose_tpu.scripts.run_procedural_accuracy"

# resumable training: --resume continues a partial run; a run already at its
# final epoch exits immediately, so re-invoking a completed run is free.
# The axon tunnel occasionally drops a remote_compile connection mid-run
# (JaxRuntimeError: INTERNAL ... response body closed) — each attempt resumes
# from the last per-epoch checkpoint, so retries only replay the tail.
train_resumable() {  # train_resumable <cli> <config> [extra args...]
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

retry() {  # retry <cmd...> — 3 attempts for flaky tunnel dispatches
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
    # run_bop_inference writes per-dataset AR summaries into bop-<ds>/ subdirs
    for d in local_data/results/bop-*/; do
        [ -d "$d" ] || continue
        mkdir -p "results/$(basename "$d")"
        cp -v "$d"metrics-*.json "results/$(basename "$d")/" 2>/dev/null || true
    done
}

# ---- 1. headline: held-out refinement (README accuracy table) ---------------
# clean single-object tier: the held-out refinement regression trains here
[ -f local_data/synt_datasets/procedural-solo/split_keys.json ] || \
    retry $REC --config procedural-solo
train_resumable "$TRAIN" procedural-diag-lr0.003-solo
retry $ACC --run-id procedural-diag-lr0.003-solo --n-frames 150 --n-iterations 4
sync_results

# ---- 1b. rotation arm: reference ±15° euler refiner noise (VERDICT r3 #2a) --
train_resumable "$TRAIN" procedural-diag-lr0.003-solo-rot-ep40
retry $ACC --run-id procedural-diag-lr0.003-solo-rot-ep40 --n-frames 150 --n-iterations 4
sync_results

# ---- 2. coarse arm (box-seeded init) for the composed pipeline --------------
# r4: coarse arms default to aux L2 regression + 60-epoch schedule so rotation
# moves from the ~120°-off z-up box init (training/configs.py)
train_resumable "$TRAIN" procedural-diag-lr0.003-solo-coarse
retry $ACC --run-id procedural-diag-lr0.003-solo-coarse --n-frames 150 --n-iterations 2
sync_results

# ---- 3. occlusion-pile tiers (detector training + harder evals) -------------
# canonical-appearance occlusion piles: trainability regression + mini eval
[ -f local_data/synt_datasets/procedural-canon/split_keys.json ] || \
    retry $REC --config procedural-canon --n-frames 4400
# randomized-texture occlusion piles: detector training + full-pipeline eval
[ -f local_data/synt_datasets/procedural-4k/split_keys.json ] || \
    retry $REC --config procedural --n-frames 4400 --out local_data/synt_datasets/procedural-4k

# ---- 4. detector (CenterNet+YOLACT) over all three recorded tiers -----------
train_resumable "$DET" detector-procedural-all --n-epochs 60
retry python -m cosypose_tpu.scripts.run_detection_eval \
    --dataset synthetic.procedural-solo.val \
    --detector detector-procedural-all --object-ds procedural --masks
retry python -m cosypose_tpu.scripts.run_detection_eval \
    --dataset synthetic.procedural-4k.val \
    --detector detector-procedural-all --object-ds procedural --masks
sync_results

# ---- 5. composed pipeline: det -> coarse -> refiner, BOP19 AR (native VSD) --
retry python -m cosypose_tpu.scripts.run_bop_inference --dataset procedural \
    --inference-ds synthetic.procedural-solo.val \
    --detector detector-procedural-all \
    --coarse procedural-diag-lr0.003-solo-coarse \
    --refiner procedural-diag-lr0.003-solo
sync_results

# ---- 6. auxiliary tier: mini refiner (eval-pipeline smoke + 4k inference) ----
train_resumable "$TRAIN" procedural-refiner-mini
retry $ACC --run-id procedural-refiner-mini --n-frames 150 --n-iterations 2
# harder 4k piles tier: box-seeded init + mini refiner
retry python -m cosypose_tpu.scripts.run_bop_inference --dataset procedural \
    --n-frames 150 --detector detector-procedural-all \
    --refiner procedural-refiner-mini
sync_results

# ---- 7. round-5 arms ---------------------------------------------------------
# textured-solo tier (rotation is render-observable here — README analysis)
[ -f local_data/synt_datasets/procedural-texsolo/split_keys.json ] || \
    retry $REC --config procedural-texsolo

# flagship B3 with the measured drop_connect fix (2x budget + equal-budget pt)
train_resumable "$TRAIN" procedural-diag-lr0.003-solo-b3-dc0-devaug-ep40
retry $ACC --run-id procedural-diag-lr0.003-solo-b3-dc0-devaug-ep40 --n-frames 150 --n-iterations 4
train_resumable "$TRAIN" procedural-diag-lr0.003-solo-b3-dc0-devaug-ep20
retry $ACC --run-id procedural-diag-lr0.003-solo-b3-dc0-devaug-ep20 --n-frames 150 --n-iterations 4

# z-lever arm (diag-z: z is the low-SNR head; zw3 = gradient priority)
train_resumable "$TRAIN" procedural-diag-lr0.003-solo-zw3-devaug-ep20
retry $ACC --run-id procedural-diag-lr0.003-solo-zw3-devaug-ep20 --n-frames 150 --n-iterations 4

# iteration-2-supervised coarse arms (overshoot fix) + texsolo refiner (ep40)
train_resumable "$TRAIN" procedural-diag-lr0.003-solo-coarse-flat-lev0.25-hi0.01-it2-devaug
retry $ACC --run-id procedural-diag-lr0.003-solo-coarse-flat-lev0.25-hi0.01-it2-devaug --n-frames 150 --n-iterations 2
train_resumable "$TRAIN" procedural-diag-lr0.003-texsolo-coarse-flat-lev0.25-hi0.01-it2-devaug
retry $ACC --run-id procedural-diag-lr0.003-texsolo-coarse-flat-lev0.25-hi0.01-it2-devaug --n-frames 150 --n-iterations 2
train_resumable "$TRAIN" procedural-diag-lr0.003-texsolo-rot-flat-lk-lev0.25-hi0.01-ep40-devaug
retry $ACC --run-id procedural-diag-lr0.003-texsolo-rot-flat-lk-lev0.25-hi0.01-ep40-devaug --n-frames 150 --n-iterations 4
sync_results

# detector v2 (softmax classifier, 32 protos, texsolo in the mix) + evals
train_resumable "$DET" detector-procedural-all2 --n-epochs 90
retry python -m cosypose_tpu.scripts.run_detection_eval \
    --dataset synthetic.procedural-4k.val \
    --detector detector-procedural-all2 --object-ds procedural --masks
retry python -m cosypose_tpu.scripts.run_detection_eval \
    --dataset synthetic.procedural-texsolo.val \
    --detector detector-procedural-all2 --object-ds procedural-tex --masks
sync_results

# composed textured pipeline BOP19 AR (+ICP)
retry python -m cosypose_tpu.scripts.run_bop_inference \
    --dataset procedural --inference-ds synthetic.procedural-texsolo.val \
    --detector detector-procedural-all2 \
    --coarse procedural-diag-lr0.003-texsolo-coarse-flat-lev0.25-hi0.01-it2-devaug \
    --refiner procedural-diag-lr0.003-texsolo-rot-flat-lk-lev0.25-hi0.01-ep40-devaug
retry python -m cosypose_tpu.scripts.run_bop_inference \
    --dataset procedural --inference-ds synthetic.procedural-texsolo.val \
    --detector detector-procedural-all2 \
    --coarse procedural-diag-lr0.003-texsolo-coarse-flat-lev0.25-hi0.01-it2-devaug \
    --refiner procedural-diag-lr0.003-texsolo-rot-flat-lk-lev0.25-hi0.01-ep40-devaug --icp
sync_results

# step-breakdown + multiview protocol bench (+ reference torch-CPU row)
python scripts/collect_step_breakdown.py \
    --run-id procedural-diag-lr0.003-solo-b3-dc0-devaug-ep40
retry timeout 2400 python -m cosypose_tpu.scripts.bench_multiview \
    --n-views 8 --n-objects 12 --ransac-iter 2000 \
    --json local_data/results/bench-multiview-protocol.json
retry timeout 3600 python -m cosypose_tpu.scripts.bench_multiview_ref \
    --n-views 8 --n-objects 12 --ransac-iter 2000 \
    --json local_data/results/bench-multiview-ref-cpu.json
sync_results
echo "regeneration complete; tracked copies in results/"
