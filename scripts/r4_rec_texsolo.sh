#!/usr/bin/env bash
# Record the rotation-learnable sine-textured solo tier (CPU workers).
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
for attempt in 1 2 3 4; do
    if [ -f local_data/synt_datasets/procedural-texsolo/split_keys.json ]; then
        echo "texsolo recording complete"; exit 0
    fi
    timeout 7200 python -m cosypose_tpu.scripts.run_dataset_recording \
        --config procedural-texsolo --n-frames 4400 || true
    sleep 5
done
[ -f local_data/synt_datasets/procedural-texsolo/split_keys.json ] && exit 0
echo "texsolo recording FAILED" >&2; exit 1
