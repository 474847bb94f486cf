"""Evaluation runners: iterate GT, feed every meter, summarize.

Capability match for the reference's ``cosypose/evaluation/eval_runner/``
(pose_eval.py / detection_eval.py): iterate the scene dataset's GT
observations, feed each meter with (predictions, gt), then gather + summarize.
"""

from __future__ import annotations

from ..utils.logging import get_logger
from ..utils.tensor_collection import concatenate
from .data_utils import parse_obs_data

logger = get_logger(__name__)


class PoseEvaluation:
    def __init__(self, scene_ds, meters: dict):
        self.scene_ds = scene_ds
        self.meters = meters

    def collect_gt(self):
        gts = []
        for idx in range(len(self.scene_ds)):
            _, _, obs = self.scene_ds[idx]
            gt = parse_obs_data(obs)
            if len(gt):
                gts.append(gt)
        return concatenate(gts)

    def evaluate(self, predictions):
        gt = self.collect_gt()
        metrics, dfs = {}, {}
        for name, meter in self.meters.items():
            meter.reset()
            meter.add(predictions, gt)
            metrics[name], dfs[name] = meter.summary()
        return metrics, dfs


class DetectionEvaluation(PoseEvaluation):
    pass  # identical skeleton; detection meters consume bboxes instead of poses
