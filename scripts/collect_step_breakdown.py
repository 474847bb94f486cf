"""Collect the training step breakdown artifact from a run's log.txt.

``train_pose.py`` logs per-epoch ``train/data_s_per_step`` (host wait on the
input pipeline) and ``train/step_s_per_step`` (full loop wall time per step,
data wait included — see the timer comments in train_pose.py). This tool
reduces those into the tracked ``results/step-breakdown.json`` artifact that
the README training section renders from (the reference logs the same split
via its data/forward/backward timers, ref cosypose/training/train_pose.py:
304-333, and reports ~70 img/s per V100 for its 80.6M-sample schedule).

Epoch 0 is excluded (it pays the XLA compile). Median and min are both
recorded: the min is the uncontended steady state on the single-core host;
the median includes any epochs where a concurrent host process stole the
core from the dispatch loop.

    python scripts/collect_step_breakdown.py --run-id <experiment> \
        [--out results/step-breakdown.json]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import statistics

import yaml

REPO = pathlib.Path(__file__).resolve().parents[1]


def collect(run_id: str) -> dict:
    run_dir = REPO / "local_data" / "experiments" / run_id
    cfg = yaml.safe_load((run_dir / "config.yaml").read_text())
    batch = int(cfg["train"]["batch_size"])
    data_s, step_s = [], []
    with open(run_dir / "log.txt") as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("epoch", 0) >= 1 and "train/step_s_per_step" in rec:
                data_s.append(rec["train/data_s_per_step"])
                step_s.append(rec["train/step_s_per_step"])
    if not step_s:
        raise SystemExit(f"{run_id}: no post-compile epochs with step timers")
    med_step = statistics.median(step_s)
    min_step = min(step_s)
    return {
        "run_id": run_id,
        "batch_size": batch,
        "n_epochs_measured": len(step_s),
        "data_s_per_step": {
            "median": round(statistics.median(data_s), 5),
            "min": round(min(data_s), 5),
        },
        "step_s_per_step": {
            "median": round(med_step, 4),
            "min": round(min_step, 4),
        },
        "img_per_s_per_chip": {
            "median": round(batch / med_step, 1),
            "best": round(batch / min_step, 1),
        },
        "ref_img_per_s_per_v100": 70.0,
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-id", required=True)
    p.add_argument("--out", default=str(REPO / "results/step-breakdown.json"))
    args = p.parse_args()
    payload = collect(args.run_id)
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=2) + "\n")
    print(json.dumps(payload))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
