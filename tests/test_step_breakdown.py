"""Step-breakdown artifact pipeline: collector reduction + README renderer.

Pins the contract between train_pose's per-epoch data_s_per_step /
step_s_per_step timers (the reference's data/forward/backward split,
ref cosypose/training/train_pose.py:304-333), the
scripts/collect_step_breakdown.py reduction, and the README table renderer.
"""

import importlib.util
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def _load_collector():
    spec = importlib.util.spec_from_file_location(
        "collect_step_breakdown",
        REPO / "scripts" / "collect_step_breakdown.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_collect_excludes_compile_epoch(tmp_path, monkeypatch):
    mod = _load_collector()
    run = tmp_path / "local_data" / "experiments" / "myrun"
    run.mkdir(parents=True)
    (run / "config.yaml").write_text(
        json.dumps({"run_id": "myrun", "train": {"batch_size": 64}})
    )
    recs = [
        # epoch 0 pays the compile: must be excluded from the medians
        {"epoch": 0, "train/data_s_per_step": 0.5,
         "train/step_s_per_step": 30.0},
        {"epoch": 1, "train/data_s_per_step": 0.003,
         "train/step_s_per_step": 0.20},
        {"epoch": 1, "val/loss_total": 0.1},  # val rows have no timers
        {"epoch": 2, "train/data_s_per_step": 0.002,
         "train/step_s_per_step": 0.16},
        {"epoch": 3, "train/data_s_per_step": 0.004,
         "train/step_s_per_step": 0.40},
    ]
    (run / "log.txt").write_text(
        "\n".join(json.dumps(r) for r in recs) + "\n"
    )
    monkeypatch.setattr(mod, "REPO", tmp_path)
    payload = mod.collect("myrun")
    assert payload["batch_size"] == 64
    assert payload["n_epochs_measured"] == 3
    assert payload["step_s_per_step"]["median"] == 0.2
    assert payload["step_s_per_step"]["min"] == 0.16
    assert payload["img_per_s_per_chip"]["median"] == 320.0  # 64 / 0.20
    assert payload["img_per_s_per_chip"]["best"] == 400.0    # 64 / 0.16


def test_step_breakdown_renderer_row():
    from cosypose_tpu.scripts.render_readme_tables import step_breakdown_table

    table = step_breakdown_table({
        "run_id": "myrun", "batch_size": 64,
        "data_s_per_step": {"median": 0.003, "min": 0.001},
        "step_s_per_step": {"median": 0.2, "min": 0.16},
        "img_per_s_per_chip": {"median": 320.0, "best": 400.0},
        "ref_img_per_s_per_v100": 70.0,
    })
    assert "| `myrun` | 64 |" in table
    assert "**320** (best 400)" in table
    assert "**4.6×**" in table  # 320 / 70


def test_tracked_artifact_renders():
    """The committed results/step-breakdown.json must render and beat the
    reference's 70 img/s/V100 (VERDICT r4 #5 done-bar: >=2.5x)."""
    payload = json.loads((REPO / "results/step-breakdown.json").read_text())
    assert payload["img_per_s_per_chip"]["median"] >= 2.5 * 70.0
    from cosypose_tpu.scripts.render_readme_tables import step_breakdown_table
    assert payload["run_id"] in step_breakdown_table(payload)
