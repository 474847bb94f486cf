"""Scene-level and batch rendering on top of the core rasterizer.

Capability match for the reference's rendering layer:
  * BatchRenderer ↔ BulletBatchRenderer (ref: bullet_batch_renderer.py:46-90):
    one object per batch item at TCO under K — already the rasterizer's native
    contract; this wrapper adds the reference's obj_infos/label API.
  * SceneRenderer ↔ BulletSceneRenderer (ref: bullet_scene_renderer.py:38-64):
    multiple posed objects per camera. Objects are composed into ONE triangle
    soup per camera (per-object TWO applied host-side on the padded
    triangle-major arrays) and rendered in a single rasterizer call —
    depth-buffered occlusion between objects comes for free, plus per-object
    segmentation ids (the simulator's get_state mask, ref: simulator/camera.py:158-178).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rasterizer import rasterize, RenderOutput
from ..ops.transforms import invert_T


class BatchRenderer:
    """render(obj label ids, TCO, K) → RGB/depth/mask, one object per item."""

    def __init__(self, mesh_db, resolution=(240, 320)):
        self.mesh_db = mesh_db
        self.resolution = resolution

    def render(self, label_ids, TCO, K, resolution=None, render_depth=False):
        res = tuple(resolution or self.resolution)
        label_ids = jnp.asarray(label_ids)
        out = rasterize(
            jnp.take(self.mesh_db.tri_verts, label_ids, axis=0),
            jnp.take(self.mesh_db.tri_valid, label_ids, axis=0),
            jnp.asarray(TCO),
            jnp.asarray(K),
            image_size=res,
            colors=jnp.take(self.mesh_db.tri_colors, label_ids, axis=0),
        )
        return out if render_depth else out.rgb


class SceneRenderer:
    """Render full scenes: lists of posed objects seen by posed cameras."""

    def __init__(self, mesh_db):
        self.mesh_db = mesh_db

    def render_scene(self, obj_infos, cam_infos, render_depth=False,
                     resolution=(240, 320)):
        """obj_infos: [{label, TWO (4,4)}]; cam_infos: [{K (3,3), TWC (4,4),
        resolution}]. Returns a list of per-camera dicts {rgb, depth, mask,
        instance_ids} (mask carries per-object instance ids, 0 = background).
        """
        db = self.mesh_db
        tri_verts_l, tri_valid_l, colors_l, inst_l = [], [], [], []
        for n, obj in enumerate(obj_infos):
            oid = db.label_to_id[obj["label"]]
            TWO = np.asarray(obj["TWO"], np.float32)
            tv = np.asarray(db.tri_verts[oid])  # (F, 3, 3)
            tv_w = tv @ TWO[:3, :3].T + TWO[:3, 3]
            tri_verts_l.append(tv_w)
            tri_valid_l.append(np.asarray(db.tri_valid[oid]))
            colors_l.append(np.asarray(db.tri_colors[oid]))
            inst_l.append(np.full(tv.shape[0], n + 1, np.int32))

        tri_verts = np.concatenate(tri_verts_l, axis=0)[None]
        tri_valid = np.concatenate(tri_valid_l, axis=0)[None]
        colors = np.concatenate(colors_l, axis=0)[None]
        inst_ids = np.concatenate(inst_l, axis=0)

        outputs = []
        for cam in cam_infos:
            res = tuple(cam.get("resolution", resolution))
            K = np.asarray(cam["K"], np.float32)[None]
            TWC = np.asarray(cam.get("TWC", np.eye(4)), np.float32)
            TCW = np.asarray(invert_T(jnp.asarray(TWC[None])))  # world→cam
            out = rasterize(
                jnp.asarray(tri_verts),
                jnp.asarray(tri_valid),
                jnp.asarray(TCW),
                jnp.asarray(K),
                image_size=res,
                colors=jnp.asarray(colors),
                tri_attr=jnp.asarray(inst_ids[None].astype(np.float32)),
            )
            result = dict(
                rgb=np.asarray(out.rgb[0]).transpose(1, 2, 0),
                mask=np.asarray(out.mask[0]),
                instance_ids=np.rint(np.asarray(out.attr[0])).astype(np.int32),
            )
            if render_depth:
                result["depth"] = np.asarray(out.depth[0])
            outputs.append(result)
        return outputs
