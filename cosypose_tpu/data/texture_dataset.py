"""Texture image dataset for recording-time domain randomization.

Capability match for the reference's TextureDataset
(ref: cosypose/datasets/texture_dataset.py:8-22): an indexable collection of
texture images discovered under a directory tree (the reference uses
ShapeNet's `*/images/texture0.jpg` layout; here any {png,jpg,jpeg} below the
root is accepted so locally generated texture packs work too). Images are
returned as float32 HxWx3 in [0, 1] for the corner-baking projector
(recording/textures.py).
"""

from __future__ import annotations

import pathlib

import numpy as np


class TextureDataset:
    def __init__(self, ds_dir):
        self.ds_dir = pathlib.Path(ds_dir)
        exts = (".png", ".jpg", ".jpeg")
        self.index = sorted(
            p for p in self.ds_dir.rglob("*") if p.suffix.lower() in exts
        )

    def __len__(self):
        return len(self.index)

    def __getitem__(self, idx: int) -> np.ndarray:
        from PIL import Image

        im = Image.open(self.index[idx]).convert("RGB")
        return np.asarray(im, np.float32) / 255.0

    def sample(self, rng: np.random.RandomState) -> np.ndarray:
        return self[rng.randint(len(self.index))]
