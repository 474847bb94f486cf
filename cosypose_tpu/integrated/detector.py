"""Inference API: 2D detection → PandasTensorCollection.

Capability match for the reference's Detector wrapper
(ref: cosypose/integrated/detector.py:8-75): normalize inputs, forward,
category→label mapping, score threshold, optional masks (threshold), optional
one-instance-per-class filtering; returns PandasTensorCollection(infos, bboxes
[, masks]). Also provides ingestion of externally-saved detections — the
reference's own paper evaluation runs from saved PoseCNN/Pix2Pose detections
(ref: cosypose/scripts/run_cosypose_eval.py:50-137).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..models.detector import CenterNetDetector, DetectorConfig, decode_detections
from ..utils.tensor_collection import PandasTensorCollection


class Detector:
    def __init__(self, model: CenterNetDetector, variables: dict,
                 label_to_category_id: dict, nms_iou: float | None = 0.5,
                 nms_cross_iou: float | None = None):
        """nms_iou: same-class greedy box NMS on the decoded top-k (the
        capability match for torchvision MaskRCNN's batched_nms in the
        reference detector); None/0 disables it."""
        self.model = model
        self.variables = variables
        self.label_to_category_id = label_to_category_id
        self.category_id_to_label = {v: k for k, v in label_to_category_id.items()}

        cfg = model.cfg

        def fwd(variables, images_nhwc):
            outputs = model.apply(variables, images_nhwc, train=False)
            return decode_detections(outputs, cfg.max_detections,
                                     nms_iou=nms_iou,
                                     nms_cross_iou=nms_cross_iou)

        self._fwd = jax.jit(fwd)

    def get_detections(self, images, detection_th=None, output_masks=False,
                       mask_th=0.05, one_instance_per_class=False):
        """images (B, 3, H, W) or (B, H, W, 3), float [0,1] or uint8 [0,255]."""
        images = jnp.asarray(images)
        if images.shape[1] == 3 and images.ndim == 4:
            images = jnp.moveaxis(images, 1, -1)
        images = images.astype(jnp.float32)
        images = jnp.where(images.max() > 1.0, images / 255.0, images)

        out = self._fwd(self.variables, images)
        scores = np.asarray(out["scores"])   # (B, K)
        cls = np.asarray(out["class_ids"])
        boxes = np.asarray(out["boxes"])
        B, K = scores.shape

        infos, bboxes, sel = [], [], []
        H, W = images.shape[1:3]
        for b in range(B):
            for k in range(K):
                if detection_th is not None and scores[b, k] <= detection_th:
                    continue
                if scores[b, k] <= 0.0:
                    continue
                label = self.category_id_to_label.get(int(cls[b, k]))
                if label is None:
                    continue
                infos.append(dict(batch_im_id=b, label=label,
                                  score=float(scores[b, k])))
                bboxes.append(boxes[b, k])
                sel.append((b, k))

        if infos:
            outputs = PandasTensorCollection(
                pd.DataFrame(infos),
                bboxes=jnp.asarray(np.stack(bboxes), jnp.float32),
            )
            if output_masks:
                # one batched resize dispatch for all selected masks (a
                # per-detection resize costs a ~40ms tunnel round trip each)
                bk = np.asarray(sel)
                ml = out["mask_logits"][jnp.asarray(bk[:, 0]),
                                        jnp.asarray(bk[:, 1])]
                ml = jax.image.resize(ml, (len(sel), H, W), method="bilinear")
                probs = np.asarray(jax.nn.sigmoid(ml))
                # YOLACT decode: crop each mask to its detection box — the
                # prototype combination is only trained to be precise inside
                # the instance region; stray activations elsewhere in the
                # frame would sink mask IoU
                bx = np.asarray(outputs.bboxes)
                yy = np.arange(H)[None, :, None]
                xx = np.arange(W)[None, None, :]
                inside = ((xx >= bx[:, None, None, 0])
                          & (xx <= bx[:, None, None, 2])
                          & (yy >= bx[:, None, None, 1])
                          & (yy <= bx[:, None, None, 3]))
                # default mask_th=0.05, calibrated by measurement: the
                # class-agnostic BCE head hedges its sigmoid far below 0.5 on
                # background-dominated stride-4 grids, so an absolute 0.5 cut
                # erodes small cluttered instances to ~25-40% of their area
                # (4k-val mask recall 0.13 at th=0.5 vs 0.94 at th=0.05; solo
                # stays at 1.0). A per-detection adaptive cut (0.5x in-box
                # peak) measured worse than the calibrated fixed cut (0.33).
                masks = (probs > mask_th) & inside
                outputs.register_tensor("masks", jnp.asarray(masks))
        else:
            outputs = PandasTensorCollection(
                pd.DataFrame(dict(batch_im_id=[], label=[], score=[])),
                bboxes=jnp.zeros((0, 4), jnp.float32),
            )
            if output_masks:
                outputs.register_tensor("masks", jnp.zeros((0, H, W), bool))

        if one_instance_per_class and len(outputs) > 0:
            inf = outputs.infos
            inf["det_idx"] = np.arange(len(inf))
            keep = (
                inf.sort_values("score", ascending=False)
                .drop_duplicates("label")["det_idx"].values
            )
            outputs = outputs[np.sort(keep)]
            outputs.infos = outputs.infos.drop(columns=["det_idx"])
        return outputs

    def __call__(self, *args, **kwargs):
        return self.get_detections(*args, **kwargs)


def load_saved_detections(df: pd.DataFrame, bboxes: np.ndarray):
    """Ingest externally-computed detections (PoseCNN / Pix2Pose / CSV dumps).

    df must carry at least (scene_id, view_id, label, score); bboxes (N, 4).
    (ref: run_cosypose_eval.py:50-137 — the paper pipeline evaluates from saved
    detections)
    """
    return PandasTensorCollection(df.reset_index(drop=True),
                                  bboxes=jnp.asarray(bboxes, jnp.float32))
