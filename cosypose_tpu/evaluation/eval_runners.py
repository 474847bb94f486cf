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
    def __init__(self, scene_ds, meters: dict, chunk_views: int = 200):
        self.scene_ds = scene_ds
        self.meters = meters
        # meters accumulate per add(); chunking bounds the pandas working set
        # at BOP scale (ycbv test = 20k images) instead of one giant merge
        self.chunk_views = chunk_views

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
        # chunk both sides by (scene_id, view_id) groups so each meter.add
        # works on a bounded frame set; results are identical because every
        # meter matches strictly within (scene, view) groups
        gt_keys = gt.infos[["scene_id", "view_id"]].drop_duplicates()
        keys = list(map(tuple, gt_keys.values.tolist()))
        pred_key = list(
            zip(predictions.infos["scene_id"], predictions.infos["view_id"])
        )
        gt_key = list(zip(gt.infos["scene_id"], gt.infos["view_id"]))
        import numpy as np

        metrics, dfs = {}, {}
        for name, meter in self.meters.items():
            meter.reset()
            for start in range(0, len(keys), self.chunk_views):
                chunk = set(keys[start:start + self.chunk_views])
                p_ids = np.asarray(
                    [i for i, k in enumerate(pred_key) if k in chunk], np.int64
                )
                g_ids = np.asarray(
                    [i for i, k in enumerate(gt_key) if k in chunk], np.int64
                )
                if len(g_ids) == 0:
                    continue
                meter.add(
                    predictions[p_ids] if len(p_ids) else predictions[p_ids],
                    gt[g_ids],
                )
            metrics[name], dfs[name] = meter.summary()
        return metrics, dfs


class DetectionEvaluation(PoseEvaluation):
    pass  # identical skeleton; detection meters consume bboxes instead of poses
