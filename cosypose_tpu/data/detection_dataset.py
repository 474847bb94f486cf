"""Train-time detection dataset (fixed-shape targets for the CenterNet detector).

Capability match for the reference's ``cosypose/datasets/detection_dataset.py``
(augment chain → per-image detection targets with a min-area filter), but
emitting CenterNet-style dense targets instead of torchvision ragged dicts:
center heatmaps (gaussian splats), width/height and offset maps with an
instance mask — fixed shapes, padded to max_objects.
"""

from __future__ import annotations

import random

import numpy as np

from .augmentations import (
    ColorJitterAugmentation,
    CropResizeToAspect,
    SceneObservation,
)


def gaussian_radius(h, w, min_overlap=0.7):
    """Standard CenterNet gaussian radius heuristic."""
    a1 = 1
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(max(b1**2 - 4 * a1 * c1, 0))
    r1 = (b1 + sq1) / 2
    a2 = 4
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    sq2 = np.sqrt(max(b2**2 - 4 * a2 * c2, 0))
    r2 = (b2 + sq2) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    sq3 = np.sqrt(max(b3**2 - 4 * a3 * c3, 0))
    r3 = (b3 + sq3) / 2
    return max(1, int(min(r1, r2, r3)))


def draw_gaussian(heatmap, cx, cy, radius):
    d = 2 * radius + 1
    sigma = d / 6.0
    xs = np.arange(-radius, radius + 1)
    g = np.exp(-(xs[None, :] ** 2 + xs[:, None] ** 2) / (2 * sigma**2))
    H, W = heatmap.shape
    x0, y0 = int(cx), int(cy)
    l, r = min(x0, radius), min(W - x0, radius + 1)
    t, b = min(y0, radius), min(H - y0, radius + 1)
    if r + l <= 0 or b + t <= 0:
        return
    heatmap[y0 - t : y0 + b, x0 - l : x0 + r] = np.maximum(
        heatmap[y0 - t : y0 + b, x0 - l : x0 + r],
        g[radius - t : radius + b, radius - l : radius + r],
    )


class DetectionDataset:
    def __init__(self, scene_ds, label_to_category_id, resize=(480, 640),
                 stride=4, max_objects=32, min_area=64.0,
                 apply_rgb_augmentation=True, visib_fract_th=0.05, seed=0):
        self.scene_ds = scene_ds
        self.label_to_category_id = label_to_category_id
        self.n_classes = len(label_to_category_id)
        self.crop_resize = CropResizeToAspect(resize)
        self.rgb_aug = ColorJitterAugmentation(p=0.4) if apply_rgb_augmentation else None
        self.resize = (min(resize), max(resize))
        self.stride = stride
        self.max_objects = max_objects
        self.min_area = min_area
        self.visib_fract_th = visib_fract_th
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.scene_ds)

    def __getitem__(self, idx):
        rgb, mask, obs = self.scene_ds[idx]
        s = SceneObservation(np.asarray(rgb), np.asarray(mask), obs)
        s = self.crop_resize(s)
        if self.rgb_aug is not None:
            s = self.rgb_aug(s)

        H, W = self.resize
        Hm, Wm = H // self.stride, W // self.stride
        heatmap = np.zeros((Hm, Wm, self.n_classes), np.float32)
        wh = np.zeros((self.max_objects, 2), np.float32)
        offset = np.zeros((self.max_objects, 2), np.float32)
        inds = np.zeros((self.max_objects,), np.int64)
        obj_mask = np.zeros((self.max_objects,), bool)
        boxes = np.zeros((self.max_objects, 4), np.float32)
        classes = np.zeros((self.max_objects,), np.int64)
        inst_masks = np.zeros((self.max_objects, Hm, Wm), np.uint8)

        n = 0
        for o in s.obs["objects"]:
            if n >= self.max_objects:
                break
            if o.get("visib_fract", 1.0) < self.visib_fract_th:
                continue
            bbox = o.get("bbox")
            if bbox is None:
                continue
            x1, y1, x2, y2 = bbox
            if (x2 - x1) * (y2 - y1) < self.min_area:
                continue
            cat = self.label_to_category_id.get(o["label"])
            if cat is None:
                continue
            cxm = (x1 + x2) / 2 / self.stride
            cym = (y1 + y2) / 2 / self.stride
            if not (0 <= cxm < Wm and 0 <= cym < Hm):
                continue
            r = gaussian_radius(
                (y2 - y1) / self.stride, (x2 - x1) / self.stride
            )
            draw_gaussian(heatmap[..., cat], cxm, cym, r)
            wh[n] = [(x2 - x1) / self.stride, (y2 - y1) / self.stride]
            offset[n] = [cxm - int(cxm), cym - int(cym)]
            inds[n] = int(cym) * Wm + int(cxm)
            obj_mask[n] = True
            boxes[n] = bbox
            classes[n] = cat
            # per-instance visible mask at head resolution (trains the YOLACT
            # coefficient head; ref's maskrcnn mask loss is per-instance too)
            seg_id = o.get("id_in_segm")
            if seg_id is not None:
                m = (s.mask == seg_id)[:: self.stride, :: self.stride]
                inst_masks[n, : m.shape[0], : m.shape[1]] = m
            n += 1

        return dict(
            image=np.transpose(s.rgb, (2, 0, 1)),
            heatmap=heatmap,
            wh=wh,
            offset=offset,
            inds=inds,
            obj_mask=obj_mask,
            boxes=boxes,
            classes=classes,
            seg_mask=(s.mask > 0),
            inst_masks=inst_masks,
        )

    @staticmethod
    def collate_fn(items):
        return {
            k: np.stack([it[k] for it in items]) for k in items[0].keys()
        }
