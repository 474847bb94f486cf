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

import functools

from ..ops.rasterizer import RenderOutput
from ..ops.render import render as rasterize  # dispatcher: Pallas on TPU
from ..ops.transforms import invert_T


@functools.partial(jax.jit, static_argnames=("image_size",))
def _render_scene_batch(tri_verts, tri_valid, colors, inst_ids, TWCs, Ks,
                        image_size):
    """All cameras in one dispatch; outputs quantized device-side."""
    n_cams = TWCs.shape[0]
    TCWs = invert_T(TWCs)
    bc = lambda x: jnp.broadcast_to(x[None], (n_cams,) + x.shape)
    # Generous triangle budget: scene soups put thousands of triangles in one
    # strip (objects + cage); the refiner-tuned per-tile cap silently culls
    # the highest ids (the cage) — visible as black bands in recordings.
    # Narrow (8, 320) strips cut per-strip overlap ~3x, and the budget is
    # clamped to the kernel's scoped-VMEM-safe maximum (coef block ≤ ~0.6MB).
    F = int(tri_verts.shape[0])
    budget = min(F, 6144)
    out = rasterize(
        bc(tri_verts), bc(tri_valid), TCWs, Ks, image_size=image_size,
        colors=bc(colors), tri_attr=bc(inst_ids),
        max_tris_per_tile=budget,
        pallas_tile=(8, 320), pallas_max_tris_per_tile=budget,
    )
    rgb8 = (out.rgb * 255.0).astype(jnp.uint8)
    inst8 = jnp.clip(out.attr + 0.5, 0, 255).astype(jnp.uint8)
    depth16 = jnp.clip(out.depth * 1000.0, 0, 65535).astype(jnp.uint16)
    return rgb8, inst8, depth16


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

        Extensions over the reference's BulletSceneRenderer contract (used by
        the recording pipeline, ref: bop_recording_scene.py:110-135 behavior):
          * obj entries may carry a `colors` override (F, 3, 3) — per-scene
            texture randomization without mutating the mesh database;
          * obj entries may instead carry raw world-frame `geometry`
            {tri_verts (F,3,3), colors (F,3,3)} with no label — used for the
            ground plane / cage walls; these render with instance id
            `instance_id` (default 0 = background, excluded from GT).
        """
        db = self.mesh_db
        tri_verts_l, tri_valid_l, colors_l, inst_l = [], [], [], []
        n_fg = 0
        for obj in obj_infos:
            if "geometry" in obj:
                g = obj["geometry"]
                tv_w = np.asarray(g["tri_verts"], np.float32)
                tri_verts_l.append(tv_w)
                tri_valid_l.append(np.ones(tv_w.shape[0], bool))
                colors_l.append(np.asarray(g["colors"], np.float32))
                inst_l.append(
                    np.full(tv_w.shape[0], obj.get("instance_id", 0), np.int32)
                )
                continue
            n_fg += 1
            oid = db.label_to_id[obj["label"]]
            TWO = np.asarray(obj["TWO"], np.float32)
            tv = np.asarray(db.tri_verts[oid])  # (F, 3, 3)
            tv_w = tv @ TWO[:3, :3].T + TWO[:3, 3]
            tri_verts_l.append(tv_w)
            tri_valid_l.append(np.asarray(db.tri_valid[oid]))
            colors_l.append(
                np.asarray(obj.get("colors", db.tri_colors[oid]), np.float32)
            )
            inst_l.append(np.full(tv.shape[0], n_fg, np.int32))

        tri_verts = np.concatenate(tri_verts_l, axis=0)[None]
        tri_valid = np.concatenate(tri_valid_l, axis=0)[None]
        colors = np.concatenate(colors_l, axis=0)[None]
        inst_ids = np.concatenate(inst_l, axis=0)

        # static-shape bucketing: scenes have varying object counts, and every
        # distinct triangle count would otherwise trigger a fresh XLA compile
        # (minutes each on CPU recording workers). Pad the soup to the next
        # power-of-two-ish bucket; padded rows are invalid (inert).
        F = tri_verts.shape[1]
        bucket = 1024
        while bucket < F:
            bucket *= 2
        if bucket > F:
            pad = bucket - F
            tri_verts = np.pad(tri_verts, ((0, 0), (0, pad), (0, 0), (0, 0)))
            tri_valid = np.pad(tri_valid, ((0, 0), (0, pad)))
            colors = np.pad(colors, ((0, 0), (0, pad), (0, 0), (0, 0)))
            inst_ids = np.pad(inst_ids, (0, pad))

        resolutions = [tuple(c.get("resolution", resolution)) for c in cam_infos]
        if len(set(resolutions)) == 1:
            # one batched rasterize over all cameras (one device dispatch),
            # with outputs quantized ON DEVICE — recording consumes uint8 rgb
            # and mm-uint16 depth anyway, and float32 transfers through the
            # TPU tunnel dominate recording time otherwise (measured ~2s per
            # 10-camera scene for ~25MB of float outputs).
            n_cams = len(cam_infos)
            Ks = np.stack([np.asarray(c["K"], np.float32) for c in cam_infos])
            TWCs = np.stack(
                [np.asarray(c.get("TWC", np.eye(4)), np.float32)
                 for c in cam_infos]
            )
            rgb8, inst8, depth16 = _render_scene_batch(
                jnp.asarray(tri_verts[0]),
                jnp.asarray(tri_valid[0]),
                jnp.asarray(colors[0]),
                jnp.asarray(inst_ids.astype(np.float32)),
                jnp.asarray(TWCs),
                jnp.asarray(Ks),
                resolutions[0],
            )
            rgb_all = np.asarray(rgb8)
            attr_all = np.asarray(inst8).astype(np.int32)
            depth_all = np.asarray(depth16) if render_depth else None
            outputs = []
            for i in range(n_cams):
                result = dict(
                    rgb=rgb_all[i].transpose(1, 2, 0).astype(np.float32)
                    / 255.0,
                    mask=attr_all[i] > 0,
                    instance_ids=attr_all[i],
                )
                if render_depth:
                    result["depth"] = depth_all[i].astype(np.float32) / 1000.0
                outputs.append(result)
            return outputs

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
                max_tris_per_tile=min(int(tri_verts.shape[1]), 6144),
                pallas_tile=(8, 320),
                pallas_max_tris_per_tile=min(int(tri_verts.shape[1]), 6144),
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
