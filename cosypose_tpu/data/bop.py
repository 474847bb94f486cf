"""BOP-format dataset ingestion (host-side).

Capability match for the reference's ``cosypose/datasets/bop.py`` and
``bop_object_datasets.py``: reads the standard BOP directory layout
(scene_camera.json / scene_gt.json / scene_gt_info.json per scene; rgb/,
mask_visib/), builds a cached frame index, and yields per-frame observations:

    rgb (H, W, 3) uint8, mask (H, W) int (instance ids), obs dict with
    objects [{label, TWO, bbox, visib_fract, id_in_segm}], camera {K, TWC,
    resolution [, depth]}, frame_info {scene_id, view_id}.

mm→m conversion on all translations/depths (ref: bop.py:111,131). The index is
cached as npz/json next to the dataset (replaces the reference's joblib-cached
feather+pickle index, ref: bop.py:29-55).
"""

from __future__ import annotations

import json
import pathlib

import numpy as np
import pandas as pd


def _deepcopy_obs(obs):
    import copy

    return copy.deepcopy(obs)


def _load_json(path):
    with open(path) as f:
        return json.load(f)


def _imread(path):
    from PIL import Image

    return np.asarray(Image.open(path))


class BOPObjectDataset:
    """Parses models_info.json → object specs (label, mesh path, units,
    symmetries, diameter) (ref: cosypose/datasets/bop_object_datasets.py:5-39).
    """

    def __init__(self, ds_dir):
        ds_dir = pathlib.Path(ds_dir)
        infos = _load_json(ds_dir / "models_info.json")
        objects = []
        for obj_id_str, info in sorted(infos.items(), key=lambda kv: int(kv[0])):
            obj_id = int(obj_id_str)
            label = f"obj_{obj_id:06d}"
            mesh_path = ds_dir / f"{label}.ply"
            objects.append(
                dict(
                    label=label,
                    category=None,
                    mesh_path=str(mesh_path),
                    mesh_units="mm",
                    symmetries_discrete=info.get("symmetries_discrete", []),
                    symmetries_continuous=info.get("symmetries_continuous", []),
                    diameter=info.get("diameter"),
                    diameter_m=(info["diameter"] / 1000.0
                                if "diameter" in info else None),
                )
            )
        self.objects = objects
        self.ds_dir = ds_dir

    def __getitem__(self, idx):
        return self.objects[idx]

    def __len__(self):
        return len(self.objects)

    def mesh_specs(self):
        """→ list[MeshSpec] consumable by ops.mesh_db.build_mesh_db."""
        from ..ops.mesh_db import MeshSpec

        return [
            MeshSpec(
                label=o["label"],
                mesh_path=o["mesh_path"],
                mesh_units=o["mesh_units"],
                symmetries_discrete=o["symmetries_discrete"],
                symmetries_continuous=o["symmetries_continuous"],
                diameter_m=o["diameter_m"],
            )
            for o in self.objects
        ]


class BOPDataset:
    """Scene dataset over a BOP split directory (ref: cosypose/datasets/bop.py:58-169)."""

    def __init__(self, ds_dir, split: str = "train", load_depth: bool = False,
                 cache_in_memory: bool = False):
        self.ds_dir = pathlib.Path(ds_dir)
        self.split_dir = self.ds_dir / split
        self.split = split
        # in-RAM frame cache: recorded regression sets are a few hundred MB
        # while the 1-core loader is the training bottleneck otherwise
        self.cache_in_memory = cache_in_memory
        self._cache = {}
        self.load_depth = load_depth
        assert self.split_dir.exists(), f"missing split dir {self.split_dir}"
        self.frame_index = self._build_index()

    def _build_index(self) -> pd.DataFrame:
        cache = self.split_dir / "cosypose_tpu_index.json"
        if cache.exists():
            return pd.DataFrame(_load_json(cache))
        rows = []
        for scene_dir in sorted(self.split_dir.iterdir()):
            if not scene_dir.is_dir():
                continue
            cam_json = scene_dir / "scene_camera.json"
            if not cam_json.exists():
                continue
            scene_id = int(scene_dir.name)
            cams = _load_json(cam_json)
            for view_id_str in sorted(cams.keys(), key=int):
                rows.append(dict(scene_id=scene_id, view_id=int(view_id_str)))
        df = pd.DataFrame(rows)
        try:
            cache.write_text(json.dumps(df.to_dict(orient="list")))
        except OSError:
            pass  # read-only dataset dirs are fine — index rebuilt per run
        return df

    def __len__(self):
        return len(self.frame_index)

    def _scene_dir(self, scene_id):
        return self.split_dir / f"{scene_id:06d}"

    def __getitem__(self, idx):
        if self.cache_in_memory:
            hit = self._cache.get(idx)
            if hit is not None:
                rgb, mask, obs = hit
                return rgb.copy(), mask.copy(), _deepcopy_obs(obs)
        item = self._load_item(idx)
        if self.cache_in_memory:
            rgb, mask, obs = item
            self._cache[idx] = (rgb, mask, obs)
            return rgb.copy(), mask.copy(), _deepcopy_obs(obs)
        return item

    def _load_item(self, idx):
        row = self.frame_index.iloc[idx]
        scene_id, view_id = int(row["scene_id"]), int(row["view_id"])
        scene_dir = self._scene_dir(scene_id)

        cam = _load_json(scene_dir / "scene_camera.json")[str(view_id)]
        K = np.asarray(cam["cam_K"], np.float32).reshape(3, 3)
        TWC = np.eye(4, dtype=np.float32)
        if "cam_R_w2c" in cam:
            T_w2c = np.eye(4, dtype=np.float32)
            T_w2c[:3, :3] = np.asarray(cam["cam_R_w2c"], np.float32).reshape(3, 3)
            T_w2c[:3, 3] = np.asarray(cam["cam_t_w2c"], np.float32) / 1000.0
            TWC = np.linalg.inv(T_w2c)

        rgb_path = scene_dir / "rgb" / f"{view_id:06d}.png"
        if not rgb_path.exists():
            rgb_path = scene_dir / "rgb" / f"{view_id:06d}.jpg"
        rgb = _imread(rgb_path)
        if rgb.ndim == 2:
            rgb = np.repeat(rgb[..., None], 3, axis=-1)
        rgb = rgb[..., :3]
        h, w = rgb.shape[:2]

        camera = dict(K=K, TWC=TWC, resolution=(h, w))
        if self.load_depth:
            depth_path = scene_dir / "depth" / f"{view_id:06d}.png"
            if depth_path.exists():
                depth = _imread(depth_path).astype(np.float32)
                depth *= cam.get("depth_scale", 1.0) / 1000.0  # mm → m
                camera["depth"] = depth

        # fast path: a precomputed aggregate id mask (<view>_all.png from
        # scripts/preprocess_bop_dataset.py) replaces N per-object file reads
        all_mask_path = scene_dir / "mask_visib" / f"{view_id:06d}_all.png"
        if all_mask_path.exists():
            mask = _imread(all_mask_path).astype(np.int32)
        else:
            mask = np.zeros((h, w), dtype=np.int32)
        objects = []
        gt_path = scene_dir / "scene_gt.json"
        if gt_path.exists():
            gts = _load_json(gt_path)[str(view_id)]
            infos_path = scene_dir / "scene_gt_info.json"
            gt_infos = (
                _load_json(infos_path)[str(view_id)]
                if infos_path.exists()
                else [{} for _ in gts]
            )
            for n, (gt, info) in enumerate(zip(gts, gt_infos)):
                TWO_cam = np.eye(4, dtype=np.float32)  # object in CAMERA frame
                TWO_cam[:3, :3] = np.asarray(gt["cam_R_m2c"], np.float32).reshape(3, 3)
                TWO_cam[:3, 3] = np.asarray(gt["cam_t_m2c"], np.float32) / 1000.0
                TWO = TWC @ TWO_cam  # world frame (ref: bop.py:118-124)
                obj = dict(
                    label=f"obj_{int(gt['obj_id']):06d}",
                    TWO=TWO,
                    visib_fract=info.get("visib_fract", 1.0),
                    id_in_segm=n + 1,
                )
                bbox = info.get("bbox_visib")
                if bbox is not None:
                    x, y, bw, bh = bbox
                    obj["bbox"] = np.asarray([x, y, x + bw, y + bh], np.float32)
                objects.append(obj)

                if not all_mask_path.exists():
                    mask_path = (
                        scene_dir / "mask_visib" / f"{view_id:06d}_{n:06d}.png"
                    )
                    if mask_path.exists():
                        m = _imread(mask_path)
                        mask[m > 0] = n + 1

        obs = dict(
            objects=objects,
            camera=camera,
            frame_info=dict(scene_id=scene_id, view_id=view_id),
        )
        return rgb, mask, obs
