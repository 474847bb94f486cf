#!/usr/bin/env bash
# Round-4 recordings (CPU-only, runs alongside TPU trainings). Resumable:
# record_dataset skips completed chunks via the chunk ledger.
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"

for attempt in 1 2 3 4 5; do
    if [ ! -f local_data/synt_datasets/procedural-canon/split_keys.json ]; then
        timeout 7200 python -m cosypose_tpu.scripts.run_dataset_recording \
            --config procedural-canon --n-frames 4400 || true
    fi
    if [ ! -f local_data/synt_datasets/procedural-4k/split_keys.json ]; then
        timeout 7200 python -m cosypose_tpu.scripts.run_dataset_recording \
            --config procedural --n-frames 4400 \
            --out local_data/synt_datasets/procedural-4k || true
    fi
    if [ -f local_data/synt_datasets/procedural-canon/split_keys.json ] && \
       [ -f local_data/synt_datasets/procedural-4k/split_keys.json ]; then
        echo "recordings complete"
        exit 0
    fi
    echo "recordings incomplete after attempt $attempt, retrying" >&2
    sleep 10
done
echo "recordings FAILED after retries" >&2
exit 1
