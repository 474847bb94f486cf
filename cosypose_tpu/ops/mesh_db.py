"""Fixed-shape batched mesh database.

TPU-native equivalent of the reference's ``cosypose/lib3d/rigid_mesh_database.py``:
object meshes are loaded on host, converted to meters, optionally reduced to AABB
corners or resampled, padded to a common point count (random-resample padding) and a
common symmetry count (identity padding, with a validity mask the reference lacks —
identity padding makes the sym-min reduction correct either way, the mask just keeps
argmins deterministic), then stored as device arrays:

    points     (n_objects, P_max, 3) float32
    valid      (n_objects, P_max)    bool
    symmetries (n_objects, S_max, 4, 4) float32
    sym_valid  (n_objects, S_max)    bool
    tri_verts  (n_objects, F_max, 3, 3) float32  (triangle-major unrolled corner
               positions for the rasterizer — index-free geometry: gathering a
               triangle *index* array and then indexing vertices with it is a
               gather-of-gathered-indices, which the XLA TPU compiler lowers
               catastrophically; dense corner arrays avoid indirection entirely)
    tri_colors (n_objects, F_max, 3, 3) float32  per-corner albedo
    tri_valid  (n_objects, F_max)    bool

``select(label_ids)`` is a device-side gather keyed by integer ids, so the whole
render-and-compare loop stays inside one jit.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .symmetries import make_bop_symmetries
from .mesh_io import load_mesh, decimate_mesh


@dataclasses.dataclass
class MeshSpec:
    """Host-side description of one object (mirrors the reference's obj infos)."""

    label: str
    mesh_path: str | None = None
    mesh_units: str = "mm"
    symmetries_discrete: list | None = None
    symmetries_continuous: list | None = None
    diameter_m: float | None = None
    # direct data path (tests / procedural meshes):
    vertices: np.ndarray | None = None  # (V, 3) in mesh units
    faces: np.ndarray | None = None  # (F, 3) int
    colors: np.ndarray | None = None  # (V, 3) albedo in [0, 1]


@jax.tree_util.register_pytree_node_class
class BatchedMeshes:
    """Padded, device-resident mesh set with label→id mapping.

    The pytree leaves are the device arrays, so a BatchedMeshes can be closed
    over / passed through jit, scan and shard_map without re-upload.
    """

    def __init__(self, labels, points, valid, symmetries, sym_valid,
                 tri_verts=None, tri_colors=None, tri_valid=None,
                 infos=None):
        self.labels = list(labels)
        self.label_to_id = {l: i for i, l in enumerate(self.labels)}
        self.points = points
        self.valid = valid
        self.symmetries = symmetries
        self.sym_valid = sym_valid
        self.tri_verts = tri_verts
        self.tri_colors = tri_colors
        self.tri_valid = tri_valid
        self.infos = infos or {}

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        leaves = (self.points, self.valid, self.symmetries, self.sym_valid,
                  self.tri_verts, self.tri_colors, self.tri_valid)
        aux = (self.labels, self.infos)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        labels, infos = aux
        return cls(labels, *leaves, infos=infos)

    # -- api ----------------------------------------------------------------
    @property
    def n_objects(self) -> int:
        return self.points.shape[0]

    @property
    def n_sym(self) -> int:
        return self.symmetries.shape[1]

    def ids_for(self, labels: Sequence[str]) -> jnp.ndarray:
        return jnp.asarray([self.label_to_id[l] for l in labels], dtype=jnp.int32)

    def select(self, label_ids: jax.Array) -> "SelectedMeshes":
        """Gather per-candidate mesh data by integer object id (device-side)."""
        out = SelectedMeshes(
            points=jnp.take(self.points, label_ids, axis=0),
            valid=jnp.take(self.valid, label_ids, axis=0),
            symmetries=jnp.take(self.symmetries, label_ids, axis=0),
            sym_valid=jnp.take(self.sym_valid, label_ids, axis=0),
        )
        return out

    def sample_points(self, label_ids, n_points: int, deterministic=True, seed=0):
        """Per-candidate point subsets (host-chosen column ids, device gather).

        (ref: cosypose/lib3d/rigid_mesh_database.py:92-95 + mesh_ops.py:31-41)
        """
        P = self.points.shape[1]
        n_points = min(n_points, P)
        rng = np.random.RandomState(0 if deterministic else seed)
        ids = jnp.asarray(rng.choice(P, size=n_points, replace=False))
        pts = jnp.take(self.points, label_ids, axis=0)
        return jnp.take(pts, ids, axis=1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SelectedMeshes:
    points: jax.Array  # (B, P, 3)
    valid: jax.Array  # (B, P)
    symmetries: jax.Array  # (B, S, 4, 4)
    sym_valid: jax.Array  # (B, S)

    def tree_flatten(self):
        return (self.points, self.valid, self.symmetries, self.sym_valid), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def _pad_points(arrs: list[np.ndarray], rng: np.random.RandomState):
    """Pad to max rows by resampling existing rows (reference's 'select_random'
    fill, ref: cosypose/lib3d/rigid_mesh_database.py:97-120), plus a validity mask.
    """
    n_max = max(a.shape[0] for a in arrs)
    out, valid = [], []
    for a in arrs:
        n_orig = a.shape[0]
        n_pad = n_max - n_orig
        if n_pad > 0:
            ids = rng.choice(n_orig, size=n_pad)
            a = np.concatenate([a, a[ids]], axis=0)
        out.append(a)
        valid.append(np.arange(n_max) < n_orig)
    return np.stack(out), np.stack(valid)


def _pad_with(arrs: list[np.ndarray], fill: np.ndarray):
    n_max = max(a.shape[0] for a in arrs)
    out, valid = [], []
    for a in arrs:
        n_pad = n_max - a.shape[0]
        if n_pad > 0:
            pad = np.broadcast_to(fill, (n_pad,) + fill.shape)
            a = np.concatenate([a, pad], axis=0)
        out.append(a)
        valid.append(np.arange(n_max) < (n_max - n_pad))
    return np.stack(out), np.stack(valid)


def build_mesh_db(
    specs: Sequence[MeshSpec],
    aabb: bool = False,
    resample_n_points: int | None = None,
    n_sym: int = 64,
    keep_geometry: bool = True,
    max_faces: int | None = 8192,
    render_max_faces: int | None = None,
) -> BatchedMeshes:
    """Load/convert all objects and assemble the padded device arrays.

    Mirrors MeshDataBase.batched() (ref: cosypose/lib3d/rigid_mesh_database.py:21-56):
    aabb=True → 8 AABB corners per object (RANSAC/BA point sets);
    resample_n_points → uniform surface resampling; otherwise raw vertices.
    keep_geometry additionally retains padded vertices+triangles for the rasterizer.

    render_max_faces decimates the RENDER geometry only (tri_verts/tri_colors)
    — ADD/loss point sets keep full fidelity. The render-and-compare crops are
    240x320, where full-resolution meshes spend ~35 px^2 per triangle; the
    Pallas raster kernel's time is linear in true triangle count, so an LOD
    matched to the render resolution buys a near-proportional raster speedup
    for invisible quality cost (the reference renders full meshes because GPU
    rasterizers are insensitive to triangle count; the TPU kernel is not).
    """
    if aabb:
        assert resample_n_points is None

    rng = np.random.RandomState(0)
    labels, points_l, syms_l, triverts_l, tricols_l = [], [], [], [], []
    infos = {}
    for spec in specs:
        colors = None
        if spec.vertices is not None:
            verts = np.asarray(spec.vertices, dtype=np.float64)
            faces = np.asarray(spec.faces if spec.faces is not None else
                               np.zeros((0, 3)), dtype=np.int64)
            colors = spec.colors
        else:
            verts, faces, colors = load_mesh(spec.mesh_path, with_colors=True)
        scale = {"mm": 0.001, "m": 1.0}[spec.mesh_units]
        verts = verts * scale
        if max_faces is not None and faces.shape[0] > max_faces:
            verts, faces, colors = decimate_mesh(verts, faces, colors, max_faces)

        if aabb:
            mins, maxs = verts.min(0), verts.max(0)
            xs = [mins[0], maxs[0]]
            ys = [mins[1], maxs[1]]
            zs = [mins[2], maxs[2]]
            pts = np.array(
                [
                    (xs[0], ys[1], zs[1]), (xs[1], ys[1], zs[1]),
                    (xs[1], ys[0], zs[1]), (xs[0], ys[0], zs[1]),
                    (xs[0], ys[1], zs[0]), (xs[1], ys[1], zs[0]),
                    (xs[1], ys[0], zs[0]), (xs[0], ys[0], zs[0]),
                ]
            )
        elif resample_n_points:
            pts = _sample_surface(verts, faces, resample_n_points, rng)
        else:
            pts = verts

        sym_dict = {
            "symmetries_discrete": spec.symmetries_discrete,
            "symmetries_continuous": spec.symmetries_continuous,
        }
        syms = make_bop_symmetries(sym_dict, n_symmetries_continuous=n_sym, scale=scale)

        labels.append(spec.label)
        points_l.append(pts.astype(np.float32))
        syms_l.append(syms)
        if keep_geometry:
            rverts, rfaces, rcolors = verts, faces, colors
            if render_max_faces is not None and faces.shape[0] > render_max_faces:
                rverts, rfaces, rcolors = decimate_mesh(
                    verts, faces, colors, render_max_faces
                )
            v32 = rverts.astype(np.float32)
            f = rfaces.astype(np.int64)
            triverts_l.append(v32[f])  # (F, 3, 3) unrolled on host, once
            if rcolors is not None:
                tricols_l.append(rcolors.astype(np.float32)[f])
            else:
                tricols_l.append(np.full((f.shape[0], 3, 3), 0.7, np.float32))
        diameter_m = spec.diameter_m
        if diameter_m is None:
            # max pairwise point distance (BOP diameter definition), computed
            # once on host from the sampled points
            sub = pts[:: max(1, pts.shape[0] // 1500)]
            d2 = ((sub[:, None] - sub[None]) ** 2).sum(-1)
            diameter_m = float(np.sqrt(d2.max()))
        infos[spec.label] = dict(
            label=spec.label, n_points=pts.shape[0], n_sym=syms.shape[0],
            diameter_m=diameter_m,
        )

    points, valid = _pad_points(points_l, rng)
    symmetries, sym_valid = _pad_with(syms_l, np.eye(4, dtype=np.float32))

    tri_verts = tri_colors = tri_valid = None
    if keep_geometry:
        # pad with degenerate zero-area triangles — rasterizer masks them out
        tri_verts, tri_valid = _pad_with(triverts_l, np.zeros((3, 3), np.float32))
        tri_colors, _ = _pad_with(tricols_l, np.zeros((3, 3), np.float32))
        tri_verts = jnp.asarray(tri_verts)
        tri_colors = jnp.asarray(tri_colors)
        tri_valid = jnp.asarray(tri_valid)

    return BatchedMeshes(
        labels,
        jnp.asarray(points),
        jnp.asarray(valid),
        jnp.asarray(symmetries),
        jnp.asarray(sym_valid),
        tri_verts=tri_verts,
        tri_colors=tri_colors,
        tri_valid=tri_valid,
        infos=infos,
    )


def _sample_surface(verts: np.ndarray, faces: np.ndarray, n: int,
                    rng: np.random.RandomState) -> np.ndarray:
    """Area-weighted uniform surface sampling (replaces trimesh.sample)."""
    if faces.shape[0] == 0:
        ids = rng.choice(verts.shape[0], size=n)
        return verts[ids]
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
    p = areas / max(areas.sum(), 1e-12)
    face_ids = rng.choice(faces.shape[0], size=n, p=p)
    r1 = np.sqrt(rng.uniform(size=(n, 1)))
    r2 = rng.uniform(size=(n, 1))
    a, b, c = v0[face_ids], v1[face_ids], v2[face_ids]
    return (1 - r1) * a + r1 * (1 - r2) * b + r1 * r2 * c
