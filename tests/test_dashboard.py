"""Interactive HTML dashboard (visualization/dashboard.py).

Capability test for the reference's bokeh log dashboards
(ref: utils/logs_bokeh.py:17-268) — multi-run curves, eval fields,
config diff — rendered as one self-contained HTML file.
"""

import json

import pytest

from cosypose_tpu.visualization.dashboard import (
    config_diff, discover_fields, load_runs, make_dashboard)


@pytest.fixture()
def run_dirs(tmp_path):
    dirs = []
    for name, lr, losses in [("run-a", 1e-3, [0.5, 0.3, 0.2]),
                             ("run-b", 3e-4, [0.6, 0.4, 0.35])]:
        d = tmp_path / name
        d.mkdir()
        (d / "config.yaml").write_text(f"run_id: {name}\nlr: {lr}\nbatch_size: 32\n")
        records = [dict(epoch=i, **{"train/loss_total": l,
                                    "eval/val/ADD_AUC": 0.1 * i})
                   for i, l in enumerate(losses)]
        (d / "log.txt").write_text(
            "\n".join(json.dumps(r) for r in records) + "\n")
        dirs.append(d)
    return dirs


def test_load_and_discover(run_dirs):
    runs = load_runs(run_dirs)
    assert set(runs) == {"run-a", "run-b"}
    assert len(runs["run-a"]["records"]) == 3
    assert discover_fields(runs, "train/") == ["train/loss_total"]
    assert discover_fields(runs, "eval/") == ["eval/val/ADD_AUC"]


def test_config_diff_only_differing_keys(run_dirs):
    rows = config_diff(load_runs(run_dirs))
    keys = [k for k, _ in rows]
    assert "lr" in keys          # differs
    assert "batch_size" not in keys   # identical across runs
    assert "run_id" not in keys  # ignored by default


def test_make_dashboard_self_contained(run_dirs, tmp_path):
    out = make_dashboard(run_dirs, tmp_path / "dash.html")
    html = out.read_text()
    # all runs + both auto-discovered fields are inlined as chart data
    assert "run-a" in html and "run-b" in html
    assert "train/loss_total" in html and "eval/val/ADD_AUC" in html
    # interactivity is embedded (no external scripts / CDN)
    assert "<script>" in html and "http" not in html.split("<script>")[1]
    assert "mousemove" in html and "logscale" in html
    # config diff table rendered
    assert "config diff" in html and "0.001" in html


def test_cli_main(run_dirs, tmp_path):
    from cosypose_tpu.scripts.make_dashboard import main

    out = main(["run-a", "run-b", "--exp-dir", str(run_dirs[0].parent),
                "--out", str(tmp_path / "cli.html")])
    assert out.exists() and "run-b" in out.read_text()


def test_missing_log_and_config_are_tolerated(tmp_path):
    empty = tmp_path / "empty-run"
    empty.mkdir()
    out = make_dashboard([empty], tmp_path / "dash.html")
    assert out.exists()
