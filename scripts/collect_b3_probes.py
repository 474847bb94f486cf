"""Collect the B3 learning-dynamics probe bisect into a tracked artifact.

Reads the ep8 probe runs' training logs (local_data/experiments/...-ep8/)
and writes results/diag-b3-dropconnect.json: per arm, the loss_xy trajectory
and whether it escaped the identity floor (0.0057). Regenerable after
`bash scripts/r5_tpu_queue.sh` stage 1.
"""

import json
import pathlib

ARMS = [
    "procedural-diag-lr0.003-solo-b3-devaug-ep8",
    "procedural-diag-lr0.003-solo-b3-dc0-devaug-ep8",
    "procedural-diag-lr0.003-solo-b3-fp32-devaug-ep8",
    "procedural-diag-lr0.003-solo-b3-hi0.01-devaug-ep8",
    "procedural-diag-lr0.003-solo-b3-aux0.3-devaug-ep8",
    "procedural-diag-lr0.001-solo-b3-devaug-ep8",
]
IDENTITY_FLOOR = 0.0057


def main():
    repo = pathlib.Path(__file__).resolve().parents[1]
    out = {}
    for arm in ARMS:
        d = repo / "local_data/experiments" / arm
        log = next((x for x in d.iterdir() if x.name.startswith("log")), None)
        if log is None:
            continue
        rows = [json.loads(l) for l in log.read_text().strip().split("\n")
                if "train/loss_total" in l]
        xy = [round(r["train/loss_xy"], 5) for r in rows]
        out[arm] = dict(
            loss_xy=xy,
            final_xy=xy[-1],
            escaped=bool(xy[-1] < 0.8 * IDENTITY_FLOOR),
        )
    path = repo / "results/diag-b3-dropconnect.json"
    with open(path, "w") as f:
        json.dump(dict(identity_floor_xy=IDENTITY_FLOOR, arms=out), f,
                  indent=2)
    print(f"wrote {path}")
    for arm, r in out.items():
        print(f"  {arm.split('solo-')[-1]:24s} final_xy={r['final_xy']:.4f} "
              f"escaped={r['escaped']}")


if __name__ == "__main__":
    main()
