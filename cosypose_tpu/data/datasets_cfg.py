"""Dataset name registries.

Capability match for the reference's ``cosypose/datasets/datasets_cfg.py``:
string name → dataset construction for scene datasets (BOP splits incl.
'.bop19' target filtering and ycbv keyframes) and object datasets (models /
models_cad / models_eval). Dataset root comes from config.LOCAL_DATA_DIR
(override per call).
"""

from __future__ import annotations

import pathlib

import numpy as np

from ..config import LOCAL_DATA_DIR
from .bop import BOPDataset, BOPObjectDataset

# BOP dataset splits used by the reference (ref: datasets_cfg.py:32-148)
_BOP_SPLITS = {
    "lm": ("lm", "test"),
    "lmo": ("lmo", "test"),
    "tless": ("tless", "test_primesense"),
    "tudl": ("tudl", "test"),
    "icbin": ("icbin", "test"),
    "itodd": ("itodd", "test"),
    "hb": ("hb", "test_primesense"),
    "ycbv": ("ycbv", "test"),
}


def make_scene_dataset(ds_name: str, ds_root=None, load_depth: bool = False):
    """e.g. 'ycbv.test', 'tless.primesense.test', 'ycbv.train.pbr',
    'ycbv.test.bop19' (keeps only BOP19 target images when the file exists),
    'synthetic.<recorded-name>.<train|val>' (datasets written by the
    recording pipeline, split via their split_keys.json —
    ref: datasets_cfg.py:116-129 synthetic registry).
    """
    parts = ds_name.split(".")
    name = parts[0]

    if name == "synthetic":
        sub, which = parts[1], (parts[2] if len(parts) > 2 else "train")
        ds_dir = (
            pathlib.Path(ds_root or LOCAL_DATA_DIR) / "synt_datasets" / sub
        )
        ds = BOPDataset(ds_dir, split="train_synt", load_depth=load_depth)
        # small recorded sets: keep decoded frames in RAM (the 1-core image
        # loader is otherwise the training bottleneck). Gate on an estimated
        # byte budget, not frame count: 20k frames at 540x720 RGB would pin
        # ~23 GB before PoseDataset's resized cache doubles it.
        est_bytes = 0
        if len(ds):
            h, w = 480, 640
            try:  # PIL reads dimensions from the header without decoding
                from PIL import Image

                row = ds.frame_index.iloc[0]
                scene_dir = ds._scene_dir(int(row["scene_id"]))
                for name in (f"{int(row['view_id']):06d}.png",
                             f"{int(row['view_id']):06d}.jpg"):
                    p = scene_dir / "rgb" / name
                    if p.exists():
                        with Image.open(p) as im:
                            w, h = im.size
                        break
            except Exception:
                pass
            est_bytes = len(ds) * h * w * 3
        ds.cache_in_memory = 0 < est_bytes <= 8 * 1024**3
        split_file = ds_dir / "split_keys.json"
        if split_file.exists():
            import json

            keys = set(json.loads(split_file.read_text())[which])
            fi = ds.frame_index
            sel = fi["scene_id"].map(lambda s: f"{int(s):06d}" in keys)
            ds.frame_index = fi[sel].reset_index(drop=True)
        return ds

    root = pathlib.Path(ds_root or LOCAL_DATA_DIR) / "bop_datasets"
    bop19 = "bop19" in parts

    if "train" in parts and "pbr" in parts:
        split = "train_pbr"
    elif "train" in parts and "synt" in parts:
        split = "train_synt"
    elif "train" in parts and "real" in parts:
        split = "train_real"
    elif "train" in parts:
        split = "train"
    elif name == "tless" and "primesense" in parts:
        split = "test_primesense" if "test" in parts else "train_primesense"
    else:
        split = _BOP_SPLITS.get(name, (name, "test"))[1]

    ds = BOPDataset(root / name, split=split, load_depth=load_depth)

    if "keyframes" in parts:
        # the YCB-Video keyframe subset used by the paper protocol
        # (ref: datasets_cfg.py:57-69; keyframe.txt from the ycbv extras)
        keyframes_path = root / name / "keyframe.txt"
        if keyframes_path.exists():
            keep = set()
            for line in keyframes_path.read_text().strip().split("\n"):
                s, v = line.split("/")
                keep.add((int(s), int(v)))
            fi = ds.frame_index
            sel = [
                i for i in range(len(fi))
                if (int(fi.iloc[i]["scene_id"]), int(fi.iloc[i]["view_id"]))
                in keep
            ]
            ds.frame_index = fi.iloc[sel].reset_index(drop=True)

    if bop19:
        targets = root / name / "test_targets_bop19.json"
        if targets.exists():
            import json

            with open(targets) as f:
                tgt = json.load(f)
            keep = {(t["scene_id"], t["im_id"]) for t in tgt}
            fi = ds.frame_index
            sel = [
                i
                for i in range(len(fi))
                if (int(fi.iloc[i]["scene_id"]), int(fi.iloc[i]["view_id"])) in keep
            ]
            ds.frame_index = fi.iloc[sel].reset_index(drop=True)
    return ds


def make_object_dataset(ds_name: str, ds_root=None):
    """e.g. 'ycbv.models', 'tless.cad', 'tless.eval', 'ycbv.bop-compat',
    'procedural' (built-in data-free object set)
    (ref: datasets_cfg.py:150-182)."""
    parts = ds_name.split(".")
    name = parts[0]
    if name == "procedural":
        from .procedural_objects import ProceduralObjectDataset

        return ProceduralObjectDataset()
    if name == "procedural-tex":
        # sine-textured variant: rotation-determining appearance (the
        # two-tone set is rotationally near-ambiguous — see
        # procedural_objects._vertex_colors_sine)
        from .procedural_objects import ProceduralObjectDataset

        return ProceduralObjectDataset(texture="sine")
    root = pathlib.Path(ds_root or LOCAL_DATA_DIR) / "bop_datasets"
    if "cad" in parts:
        subdir = "models_cad"
    elif "eval" in parts:
        subdir = "models_eval"
    else:
        subdir = "models"
    return BOPObjectDataset(root / name / subdir)


def make_texture_dataset(name_or_path: str, ds_root=None):
    """Texture image sets for recording-time randomization — 'shapenet'
    resolves to <data>/textures/shapenet (the reference downloads ShapeNet
    textures there, ref: datasets_cfg.py:223-229); any other value is taken
    as a directory path."""
    from .texture_dataset import TextureDataset

    p = pathlib.Path(name_or_path)
    if not p.is_absolute():
        p = pathlib.Path(ds_root or LOCAL_DATA_DIR) / "textures" / name_or_path
    return TextureDataset(p)


def make_urdf_dataset(ds_name: str, ds_root=None):
    """URDF assets are a pybullet-rendering concept; the TPU rasterizer renders
    PLY meshes directly, so this registry simply aliases the object dataset
    (documented divergence — ref: datasets_cfg.py:185-221)."""
    return make_object_dataset(ds_name, ds_root)
