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
    'ycbv.test.bop19' (keeps only BOP19 target images when the file exists).
    """
    root = pathlib.Path(ds_root or LOCAL_DATA_DIR) / "bop_datasets"
    parts = ds_name.split(".")
    name = parts[0]
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


def make_object_dataset(ds_name: str, ds_root=None) -> BOPObjectDataset:
    """e.g. 'ycbv.models', 'tless.cad', 'tless.eval', 'ycbv.bop-compat'
    (ref: datasets_cfg.py:150-182)."""
    root = pathlib.Path(ds_root or LOCAL_DATA_DIR) / "bop_datasets"
    parts = ds_name.split(".")
    name = parts[0]
    if "cad" in parts:
        subdir = "models_cad"
    elif "eval" in parts:
        subdir = "models_eval"
    else:
        subdir = "models"
    return BOPObjectDataset(root / name / subdir)


def make_urdf_dataset(ds_name: str, ds_root=None):
    """URDF assets are a pybullet-rendering concept; the TPU rasterizer renders
    PLY meshes directly, so this registry simply aliases the object dataset
    (documented divergence — ref: datasets_cfg.py:185-221)."""
    return make_object_dataset(ds_name, ds_root)
