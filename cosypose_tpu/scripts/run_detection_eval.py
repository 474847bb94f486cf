"""Detector mAP evaluation CLI.

Capability match for the reference's ``cosypose/scripts/run_detection_eval.py``:
run a detector over a dataset and report detection AP/mAP/recall.

  python -m cosypose_tpu.scripts.run_detection_eval --dataset ycbv \
      --detector RUN_ID [--detection-th 0.0]
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..data.datasets_cfg import make_object_dataset, make_scene_dataset
from ..evaluation.eval_runners import DetectionEvaluation
from ..evaluation.meters import DetectionMeter
from ..evaluation.pred_runners import DetectionRunner
from ..utils.logging import get_logger
from ..utils.tensor_collection import PandasTensorCollection
from .run_bop_inference import load_detector

logger = get_logger(__name__)


class _DetectionGTEvaluation(DetectionEvaluation):
    def __init__(self, scene_ds, meters, with_masks: bool = False, **kw):
        super().__init__(scene_ds, meters, **kw)
        self.with_masks = with_masks

    def collect_gt(self):
        from ..utils.tensor_collection import concatenate

        gts = []
        for idx in range(len(self.scene_ds)):
            _, segm, obs = self.scene_ds[idx]
            frame = obs["frame_info"]
            rows, boxes, masks = [], [], []
            for o in obs["objects"]:
                if o.get("bbox") is None:
                    continue
                rows.append(
                    dict(scene_id=frame["scene_id"], view_id=frame["view_id"],
                         label=o["label"],
                         visib_fract=o.get("visib_fract", 1.0))
                )
                boxes.append(o["bbox"])
                if self.with_masks:
                    # fail loudly at the source: segm=None or a missing
                    # id_in_segm would otherwise produce silently-empty GT
                    # masks that can never match, deflating mask AP
                    assert segm is not None, (
                        "mask eval needs segmentation maps; this dataset's "
                        "loader returned segm=None")
                    assert "id_in_segm" in o, (
                        f"object {o['label']} has no id_in_segm; cannot "
                        "build its GT mask")
                    masks.append(segm == int(o["id_in_segm"]))
            if rows:
                tc = PandasTensorCollection(
                    pd.DataFrame(rows),
                    bboxes=jnp.asarray(np.stack(boxes), jnp.float32),
                )
                if self.with_masks:
                    tc.register_tensor("masks", jnp.asarray(np.stack(masks)))
                gts.append(tc)
        return concatenate(gts)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True,
                        help="BOP name (evaluates <ds>.test) or a full scene "
                             "dataset name like synthetic.procedural-4k.val")
    parser.add_argument("--detector", required=True)
    parser.add_argument("--object-ds", default=None,
                        help="object dataset (default <ds>.models; "
                             "'procedural' for the built-in set)")
    parser.add_argument("--detection-th", type=float, default=0.0)
    parser.add_argument("--masks", action="store_true",
                        help="also report mask AP/mAP (COCO-segm-style "
                             "matching over the YOLACT mask head output)")
    parser.add_argument("--mask-th", type=float, default=0.05,
                        help="mask binarization threshold; default calibrated "
                             "by sweep (integrated/detector.py decode notes): "
                             "the BCE-trained probabilities hedge low on "
                             "background-dominated grids")
    parser.add_argument("--n-frames", type=int, default=None)
    parser.add_argument("--nms-cross-iou", type=float, default=0.0,
                        help="class-agnostic duplicate suppression threshold; "
                             "default OFF — measured dead end, see "
                             "models/detector.py:_nms_keep notes (multi-class "
                             "hypotheses per peak carry recall)")
    parser.add_argument("--nms-iou", type=float, default=0.5,
                        help="same-class greedy box NMS on the decoded "
                             "top-k (0 disables)")
    parser.add_argument("--ds-root", default=None)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(argv)

    scene_name = (args.dataset if "." in args.dataset
                  else f"{args.dataset}.test")
    scene_ds = make_scene_dataset(scene_name, ds_root=args.ds_root)
    n_keep = 8 if args.debug else args.n_frames
    if n_keep:
        scene_ds.frame_index = scene_ds.frame_index.iloc[:n_keep].reset_index(
            drop=True)
    obj_ds = make_object_dataset(args.object_ds or f"{args.dataset}.models",
                                 ds_root=args.ds_root)
    if hasattr(obj_ds, "objects"):
        labels = {o["label"]: i for i, o in enumerate(obj_ds.objects)}
    else:
        labels = {l: i for i, l in enumerate(obj_ds.labels)}

    detector = load_detector(args.detector, labels, nms_iou=args.nms_iou,
                             nms_cross_iou=args.nms_cross_iou or None)
    runner = DetectionRunner(scene_ds)
    preds = runner.get_predictions(detector, detection_th=args.detection_th,
                                   output_masks=args.masks,
                                   mask_th=args.mask_th)

    meters = {"bbox@0.5": DetectionMeter(iou_threshold=0.5)}
    if args.masks:
        meters["mask@0.5"] = DetectionMeter(iou_threshold=0.5,
                                            match_by="mask")
    evaluator = _DetectionGTEvaluation(scene_ds, meters,
                                       with_masks=args.masks)
    metrics, dfs = evaluator.evaluate(preds["detections"])
    for name, summary in metrics.items():
        logger.info(f"{name}: {summary}")

    # pin the measurement as an artifact (same contract as
    # run_procedural_accuracy): README numbers must be regenerable from JSONs
    import json

    from ..config import RESULTS_DIR

    out = (RESULTS_DIR
           / f"detection-{args.detector}-{scene_name.replace('.', '_')}.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    payload = dict(
        detector=args.detector, dataset=scene_name,
        detection_th=args.detection_th, nms_iou=args.nms_iou,
        n_frames=int(len(scene_ds.frame_index)),
        metrics={
            name: {k: float(v) for k, v in summary.items()
                   if isinstance(v, (int, float, np.floating))}
            for name, summary in metrics.items()
        },
        # per-class AP: where the mAP mass sits (class confusion shows up as
        # a bimodal spread here, not in the pooled AP)
        ap_per_label={
            name: {l: float(v)
                   for l, v in d.get("ap_per_label", {}).items()}
            for name, d in dfs.items()
        },
    )
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    logger.info(f"wrote {out}")
    return payload


if __name__ == "__main__":
    main()
