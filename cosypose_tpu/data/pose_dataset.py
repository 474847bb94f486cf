"""Train-time pose dataset: augment, pick one visible object, emit fixed arrays.

Capability match for the reference's ``cosypose/datasets/pose_dataset.py``:
visibility filtering → crop/resize-to-aspect → background paste → photometric
jitter → pick ONE random visible object per frame → (image, bbox, TCO, K,
label), with a retry loop over random indices when a frame has no valid object
(ref: pose_dataset.py:127-140).

TPU-first: the collate path emits a dict of fixed-shape numpy arrays
(images uint8 NCHW, K, TCO, bboxes, label_ids int32) ready for device upload —
the train step is a single jit over these (training/pose_training.py).
"""

from __future__ import annotations

import dataclasses
import random

import numpy as np

from .augmentations import (
    BackgroundAugmentation,
    ColorJitterAugmentation,
    CropResizeToAspect,
    SceneObservation,
)


@dataclasses.dataclass
class PoseData:
    images: np.ndarray     # (B, 3, H, W) uint8
    K: np.ndarray          # (B, 3, 3) float32
    TCO: np.ndarray        # (B, 4, 4) float32
    bboxes: np.ndarray     # (B, 4) float32
    labels: list           # length B


PoseBatch = PoseData


class PoseDataset:
    def __init__(
        self,
        scene_ds,
        resize=(480, 640),
        apply_rgb_augmentation=True,
        background_image_paths=(),
        voc_root=None,
        min_area: float = 0.0,
        visib_fract_th: float = 0.1,
        seed: int = 0,
    ):
        self.scene_ds = scene_ds
        self.crop_resize = CropResizeToAspect(resize)
        if voc_root is not None:
            from .augmentations import VOCBackgroundAugmentation

            self.background_aug = VOCBackgroundAugmentation(voc_root, p=0.3)
        elif background_image_paths:
            self.background_aug = BackgroundAugmentation(
                background_image_paths, p=0.3
            )
        else:
            self.background_aug = None
        self.rgb_aug = ColorJitterAugmentation(p=0.4) if apply_rgb_augmentation else None
        self.min_area = min_area
        self.visib_fract_th = visib_fract_th
        self.rng = random.Random(seed)
        self._resized_cache = {}

    def __len__(self):
        return len(self.scene_ds)

    def get_data(self, idx):
        # cache the deterministic prefix (load + crop-resize) when the
        # underlying scene dataset is itself RAM-cached; only the random
        # augmentations and object pick run per access
        cached = getattr(self.scene_ds, "cache_in_memory", False)
        s = self._resized_cache.get(idx) if cached else None
        if s is None:
            rgb, mask, obs = self.scene_ds[idx]
            s = SceneObservation(np.asarray(rgb), np.asarray(mask), obs)
            s = self.crop_resize(s)
            if cached:
                self._resized_cache[idx] = s
        if self.background_aug is not None:
            s = self.background_aug(s)
        if self.rgb_aug is not None:
            s = self.rgb_aug(s)

        # visible objects with a valid box (ref: visibility_wrapper.py:5-15 +
        # pose_dataset.py:100-125)
        valid = []
        for o in s.obs["objects"]:
            if o.get("visib_fract", 1.0) < self.visib_fract_th:
                continue
            bbox = o.get("bbox")
            if bbox is None:
                continue
            area = max(0.0, bbox[2] - bbox[0]) * max(0.0, bbox[3] - bbox[1])
            if area <= self.min_area:
                continue
            valid.append(o)
        if not valid:
            return None

        obj = self.rng.choice(valid)
        cam = s.obs["camera"]
        TWC = cam.get("TWC", np.eye(4, dtype=np.float32))
        TCO = np.linalg.inv(TWC) @ obj["TWO"]
        return dict(
            image=np.transpose(s.rgb, (2, 0, 1)),  # CHW uint8
            K=np.asarray(cam["K"], np.float32),
            TCO=TCO.astype(np.float32),
            bbox=np.asarray(obj["bbox"], np.float32),
            label=obj["label"],
        )

    def __getitem__(self, idx):
        # retry loop over random indices (ref: pose_dataset.py:127-140)
        item = self.get_data(idx)
        tries = 0
        while item is None and tries < 10:
            idx = self.rng.randint(0, len(self) - 1)
            item = self.get_data(idx)
            tries += 1
        if item is None:
            raise ValueError("No valid object found after 10 retries")
        return item

    @staticmethod
    def collate_fn(items) -> PoseData:
        return PoseData(
            images=np.stack([it["image"] for it in items]),
            K=np.stack([it["K"] for it in items]),
            TCO=np.stack([it["TCO"] for it in items]),
            bboxes=np.stack([it["bbox"] for it in items]),
            labels=[it["label"] for it in items],
        )

    def make_batch(self, ids) -> PoseData:
        return self.collate_fn([self[i] for i in ids])
