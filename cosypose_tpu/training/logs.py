"""Training metric logging: jsonlines log.txt per run.

Capability match for the reference's rank-0 logging (ref: train_pose.py:46-73 —
AverageValueMeter dicts all-reduced then appended as JSON lines to log.txt and
per-dataset errors files). With jit DP, metrics come back already globally
averaged (lax all-reduce inside the step), so the logger is a plain
accumulate-and-append.
"""

from __future__ import annotations

import json
import pathlib
import time
from collections import defaultdict

import numpy as np


class MetricsAccumulator:
    """Mean-accumulates metric dicts.

    Values may be device arrays: they are buffered as-is and only converted
    to floats in means() — per-step float() conversions force a device sync
    each (≈40ms/readback through the TPU tunnel), which gates the whole
    train-step pipeline.
    """

    def __init__(self):
        self.buffers = defaultdict(list)

    def add(self, metrics: dict):
        for k, v in metrics.items():
            self.buffers[k].append(v)

    def means(self) -> dict:
        import numpy as np

        return {
            k: float(np.mean([float(v) for v in vs]))
            for k, vs in self.buffers.items()
        }

    def reset(self):
        self.buffers.clear()


class RunLogger:
    def __init__(self, run_dir):
        self.run_dir = pathlib.Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.log_path = self.run_dir / "log.txt"
        self.t0 = time.time()

    def append(self, epoch: int, train_metrics: dict, extra: dict | None = None):
        record = dict(epoch=epoch, time=time.time() - self.t0)
        record.update({f"train/{k}": v for k, v in train_metrics.items()})
        if extra:
            record.update(extra)
        with open(self.log_path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")
        return record

    def read(self):
        if not self.log_path.exists():
            return []
        with open(self.log_path) as f:
            return [json.loads(l) for l in f if l.strip()]
