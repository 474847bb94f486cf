"""Scene dataset wrappers: visibility filter and multi-view grouping.

Capability match for the reference's ``cosypose/datasets/wrappers/``:
VisibilityWrapper (drop invisible objects, ref: visibility_wrapper.py:5-15)
and MultiViewWrapper (group frames of a scene into fixed-size view groups with
a deterministic permutation + group_id, ref: multiview_wrapper.py:8-52).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class VisibilityWrapper:
    def __init__(self, scene_ds, visib_fract_th: float = 0.1):
        self.scene_ds = scene_ds
        self.visib_fract_th = visib_fract_th

    def __len__(self):
        return len(self.scene_ds)

    @property
    def frame_index(self):
        return self.scene_ds.frame_index

    def __getitem__(self, idx):
        rgb, mask, obs = self.scene_ds[idx]
        obs = dict(obs)
        obs["objects"] = [
            o
            for o in obs["objects"]
            if o.get("visib_fract", 1.0) >= self.visib_fract_th
        ]
        return rgb, mask, obs


class ConcatSceneDataset:
    """Concatenation of several scene datasets (ref trains its detector over
    synt+real dataset lists, cosypose/scripts/run_detector_training.py — the
    rebuild's recorded tiers are combined the same way)."""

    def __init__(self, datasets):
        import pandas as pd

        self.datasets = list(datasets)
        self._offsets = []
        total = 0
        for ds in self.datasets:
            self._offsets.append(total)
            total += len(ds)
        self._len = total
        # built once: children are fixed at construction, and callers touch
        # frame_index repeatedly (samplers, length checks)
        self.frame_index = pd.concat(
            [ds.frame_index for ds in self.datasets], ignore_index=True
        )

    def __len__(self):
        return self._len

    def __getitem__(self, idx):
        for ds, off in zip(reversed(self.datasets), reversed(self._offsets)):
            if idx >= off:
                return ds[idx - off]
        raise IndexError(idx)


class MultiViewWrapper:
    """Groups each scene's frames into view groups of size ≤ n_views with a
    deterministic seeded permutation; __getitem__(group_idx) returns the list
    of (rgb, mask, obs) for the group, each obs annotated with group_id."""

    def __init__(self, scene_ds, n_views: int = 4, seed: int = 0):
        self.scene_ds = scene_ds
        self.n_views = n_views
        fi = scene_ds.frame_index.copy()
        fi["ds_idx"] = np.arange(len(fi))
        groups = []
        group_id = 0
        rng = np.random.RandomState(seed)
        for scene_id, scene_frames in fi.groupby("scene_id"):
            ids = scene_frames["ds_idx"].values
            ids = ids[rng.permutation(len(ids))]
            for start in range(0, len(ids), n_views):
                chunk = ids[start : start + n_views]
                groups.append(dict(group_id=group_id, scene_id=scene_id,
                                   ds_ids=chunk))
                group_id += 1
        self.groups = groups
        self.frame_index = pd.DataFrame(
            [
                dict(group_id=g["group_id"], scene_id=g["scene_id"],
                     n_views=len(g["ds_ids"]))
                for g in groups
            ]
        )

    def __len__(self):
        return len(self.groups)

    def __getitem__(self, idx):
        g = self.groups[idx]
        out = []
        for ds_idx in g["ds_ids"]:
            rgb, mask, obs = self.scene_ds[int(ds_idx)]
            obs = dict(obs)
            obs["frame_info"] = dict(obs["frame_info"], group_id=g["group_id"])
            out.append((rgb, mask, obs))
        return out


class PartialSampler:
    """Random epoch_size subset of dataset indices (ref: samplers.py:7-17)."""

    def __init__(self, ds, epoch_size: int, seed: int = 0):
        self.n = len(ds)
        self.epoch_size = min(epoch_size, self.n)
        self.rng = np.random.RandomState(seed)

    def __iter__(self):
        return iter(self.rng.permutation(self.n)[: self.epoch_size].tolist())

    def __len__(self):
        return self.epoch_size


class DistributedSceneSampler:
    """Deterministic array_split of indices across ranks (ref: samplers.py:20-34).
    On TPU, 'rank' is the host process index (jax.process_index())."""

    def __init__(self, ds, num_replicas: int, rank: int, shuffle: bool = True,
                 seed: int = 0):
        indices = np.arange(len(ds))
        if shuffle:
            indices = np.random.RandomState(seed).permutation(indices)
        self.indices = np.array_split(indices, num_replicas)[rank].tolist()

    def __iter__(self):
        return iter(self.indices)

    def __len__(self):
        return len(self.indices)


class ListSampler:
    def __init__(self, ids):
        self.ids = list(ids)

    def __iter__(self):
        return iter(self.ids)

    def __len__(self):
        return len(self.ids)
