"""Multi-view visualization utilities.

Capability match for the reference's ``cosypose/visualization/multiview.py``:
nms3d (translation-threshold NMS over scene predictions, ref: :28-52) and
scene-reconstruction renderings (ref: make_scene_renderings :55-141 — the
reference spins a pybullet scene camera; here the SceneRenderer orbits the
reconstructed scene).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..rendering.scene_renderer import SceneRenderer
from ..utils.tensor_collection import PandasTensorCollection


def nms3d(preds: PandasTensorCollection, th: float = 0.04,
          poses_attr: str = "poses") -> PandasTensorCollection:
    """Greedy score-ordered suppression of predictions whose translations are
    within `th` meters (ref: visualization/multiview.py:28-52)."""
    TCO = np.asarray(getattr(preds, poses_attr))
    infos = preds.infos
    scores = infos["score"].values
    all_t = TCO[:, :3, 3]
    argsort = np.argsort(-scores)
    tested, keep = set(), []
    for idx in argsort:
        if idx in tested:
            continue
        dists = np.linalg.norm(TCO[idx, :3, 3] - all_t, axis=-1)
        dists[idx] = np.inf
        for j in np.where(dists <= th)[0]:
            tested.add(int(j))
        keep.append(int(idx))
    out = PandasTensorCollection(
        infos.iloc[keep],
        **{poses_attr: jnp.asarray(TCO[keep])},
    )
    for k, v in preds.tensors.items():
        if k != poses_attr:
            out.register_tensor(k, jnp.asarray(np.asarray(v)[keep]))
    return out


def make_scene_renderings(objects, cameras, mesh_db, n_frames: int = 16,
                          resolution=(240, 320), orbit_radius: float = 1.5,
                          use_nms3d: bool = True):
    """Orbit renderings of a reconstructed scene → list of (H, W, 3) uint8.

    objects: PandasTensorCollection with infos[label(, score)] + TWO.
    (ref: visualization/multiview.py:55-141)
    """
    if use_nms3d and "score" in objects.infos:
        objects = nms3d(objects, poses_attr="TWO")
    obj_infos = [
        dict(label=objects.infos["label"].iloc[n],
             TWO=np.asarray(objects.TWO[n]))
        for n in range(len(objects))
    ]
    center = np.mean([o["TWO"][:3, 3] for o in obj_infos], axis=0)
    renderer = SceneRenderer(mesh_db)
    h, w = resolution
    f = 1.2 * max(resolution)
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)

    frames = []
    for i in range(n_frames):
        phi = 2 * np.pi * i / n_frames
        eye = center + orbit_radius * np.array(
            [np.cos(phi) * 0.8, np.sin(phi) * 0.8, -0.6]
        )
        zc = center - eye
        zc = zc / np.linalg.norm(zc)
        up = np.array([0.0, 0.0, 1.0])
        xc = np.cross(zc, up)
        xc = xc / max(np.linalg.norm(xc), 1e-6)
        yc = np.cross(zc, xc)
        TWC = np.eye(4, dtype=np.float32)
        TWC[:3, 0], TWC[:3, 1], TWC[:3, 2], TWC[:3, 3] = xc, yc, zc, eye
        out = renderer.render_scene(
            obj_infos, [dict(K=K, TWC=TWC, resolution=resolution)]
        )[0]
        frames.append((out["rgb"] * 255).astype(np.uint8))
    return frames
