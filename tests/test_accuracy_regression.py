"""End-to-end accuracy regression: the trained refiner must improve noisy
initializations on held-out recorded frames (VERDICT r1 #2 — the rebuild's
analog of the reference's pinned result tables, ref README.md:233,264-277).

Requires the recorded procedural dataset and a trained checkpoint
(scripts/run_dataset_recording --config procedural +
scripts/run_pose_training --config procedural-refiner); skipped when absent
so the suite stays green on fresh clones.
"""

import pathlib

import pytest

pytestmark = pytest.mark.slow

from cosypose_tpu.config import EXP_DIR, LOCAL_DATA_DIR  # noqa: E402

_DS = LOCAL_DATA_DIR / "synt_datasets" / "procedural-4k"
_RUN = EXP_DIR / "procedural-refiner"


@pytest.mark.skipif(
    not (_DS.exists() and (_RUN / "checkpoint").exists()),
    reason="needs recorded procedural-4k dataset + trained procedural-refiner",
)
def test_trained_refiner_improves_noisy_init():
    from cosypose_tpu.scripts.run_procedural_accuracy import main

    results = main([
        "--run-id", "procedural-refiner",
        "--n-frames", "40",
        "--n-iterations", "4",
    ])
    init, refined = results["init"], results["refined"]
    # the meter's matching threshold (0.1·diameter) makes AUC count accurate
    # poses only; a working refiner must clearly beat the noisy init
    assert refined["AUC"] > init["AUC"] * 1.5
    assert refined["0.1d"] > init["0.1d"] * 1.5
    # and the absolute level must show real learning (pinned after the
    # reference 40-epoch schedule; see README accuracy table)
    assert refined["0.1d"] > 0.2
