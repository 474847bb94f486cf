"""print_results_table renders README rows from results JSONs."""

import json

from cosypose_tpu.scripts.print_results_table import (
    detection_table,
    per_pair_table,
)


def _pair_stats(add, dxy, dz, frac):
    return dict(ADD_mean=add, ADD_median=add, ADD_p90=2 * add,
                dxy_mean=dxy, dz_mean=dz, frac_ADD_lt_0p1d=frac)


def test_per_pair_table_rows_and_drop():
    results = dict(
        n_iterations=2,
        per_pair={
            "init": _pair_stats(0.030, 0.010, 0.020, 0.1),
            "iteration=1": _pair_stats(0.015, 0.005, 0.012, 0.4),
            "iteration=2": _pair_stats(0.012, 0.004, 0.010, 0.5),
        },
        matched_auc={"init": {"AUC": 0.1}, "refined": {"AUC": 0.5}},
    )
    table = per_pair_table(results)
    lines = table.splitlines()
    assert lines[0].startswith("| | ADD mean | ADD median")
    assert "| init (noisy) | 30.0 mm | 30.0 mm | 60.0 mm" in table
    # -50% median drop annotated on the refined rows only
    assert "15.0 mm (-50%)" in table
    assert "(-50%)" not in lines[2]  # init row
    assert "init 0.100 → refined 0.500" in table


def test_per_pair_table_round_trips_json(tmp_path):
    # the exact payload shape run_procedural_accuracy writes
    results = dict(
        run_id="x", dataset="d", n_iterations=1,
        per_pair={"init": _pair_stats(0.02, 0.01, 0.01, 0.2),
                  "iteration=1": _pair_stats(0.01, 0.005, 0.006, 0.6)},
    )
    p = tmp_path / "r.json"
    p.write_text(json.dumps(results))
    table = per_pair_table(json.loads(p.read_text()))
    assert table.count("|") > 10


def test_detection_table_metrics_payload():
    payload = dict(
        detector="det", dataset="d",
        metrics={"bbox@0.5": dict(recall=0.8, AP=0.3, mAP=0.25, n_gt=100),
                 "mask@0.5": dict(recall=0.5, AP=0.2, mAP=0.15, n_gt=100)},
    )
    out = detection_table(payload)
    assert "bbox@0.5: recall 0.800, AP 0.300, mAP 0.250, n_gt 100" in out
    assert "mask@0.5" in out
