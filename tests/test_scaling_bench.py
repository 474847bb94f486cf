"""DP-sharding exactness across device counts (VERDICT r2 missing #4).

The sharded train step (batch over the 'data' mesh axis, params replicated,
XLA gradient all-reduce) must compute the SAME loss regardless of how many
devices the global batch is split over — the multi-chip program is a pure
partitioning of the single-chip one. Runs scripts/bench_scaling.py's child
mode in subprocesses (jax_num_cpu_devices is fixed at backend init) at
n=1 and n=4 and compares losses after several optimizer steps.
"""

import json
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _run(n_devices):
    proc = subprocess.run(
        [sys.executable, "-m", "cosypose_tpu.scripts.bench_scaling",
         "--single", str(n_devices), "--batch", "8", "--steps", "3"],
        capture_output=True, text=True, timeout=900,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, f"n={n_devices} failed:\n{proc.stdout}\n{proc.stderr[-2000:]}"
    return json.loads(lines[-1])


def test_sharded_step_loss_matches_across_device_counts():
    r1 = _run(1)
    r4 = _run(4)
    assert r1["loss"] == pytest.approx(r4["loss"], abs=2e-4), (r1, r4)
    assert r1["grad_bytes"] == r4["grad_bytes"]
