"""Batched on-device triangle rasterizer (depth-buffered, perspective-correct).

This replaces the reference's pybullet render path — a pool of 8 CPU worker
processes round-tripping poses/images through multiprocessing queues every
refinement iteration (ref: cosypose/rendering/bullet_batch_renderer.py:46-116) —
with a fully on-device renderer that lives *inside* the jitted render-and-compare
loop. This is the single largest architectural divergence from the reference
(SURVEY.md §2.3) and removes its dominant host↔device boundary.

Design (TPU-first):
  * Everything is fixed-shape: meshes are padded to (V_max, 3)/(F_max, 3) by the
    mesh database; invalid/degenerate triangles are masked out.
  * Geometry is reduced to per-triangle *affine screen-space planes*: barycentric
    edge functions, 1/z, and color·(1/z) are all affine in (x, y), so per-pixel
    work is two FMAs per plane — pure VPU math with no gathers in the hot loop.
  * A binning pass assigns triangles to image tiles (bbox overlap + top_k),
    bounding per-pixel work to `max_tris_per_tile` instead of F_max.
  * The per-tile loop is a `lax.scan` (bounded memory, XLA pipelines the steps);
    within a step all batch items × tile pixels × binned triangles are evaluated
    as one vectorized block.

Outputs match what the reference consumes: RGB in [0,1] (network input), metric
depth (ICP refiner), and a foreground mask (recording/segmentation).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RenderOutput(NamedTuple):
    rgb: jax.Array    # (B, 3, H, W) float32 in [0, 1]
    depth: jax.Array  # (B, H, W) float32, 0 where no hit
    mask: jax.Array   # (B, H, W) bool
    attr: jax.Array | None = None  # (B, H, W) winner's flat per-triangle attribute


def _triangle_planes(tri_verts_cam, tri_valid, K, tri_colors, z_near):
    """Per-triangle affine plane coefficients in screen space.

    tri_verts_cam (F, 3, 3) camera-frame per-triangle corner positions
    (unrolled — the mesh database stores triangle-major geometry precisely so
    the hot path has ZERO index indirection; gathers of gathered index arrays
    trigger a catastrophic XLA/TPU lowering); K (3, 3); tri_colors (F, 3, 3)
    per-corner albedo. Returns a dict of (F, ...) arrays:
      lam_a/lam_b/lam_c (F, 3): barycentric_i(x,y) = a_i x + b_i y + c_i
      iz_abc (F, 3): plane for 1/z; col_* (F, 3): planes for color·(1/z)
      bbox (F, 4), valid (F,)
    """
    tv = tri_verts_cam  # (F, 3corners, 3xyz)
    z = tv[..., 2]
    tbehind = (z < z_near).any(axis=-1)
    zs = jnp.maximum(z, z_near)
    u = K[0, 0] * tv[..., 0] / zs + K[0, 2]  # (F, 3)
    v = K[1, 1] * tv[..., 1] / zs + K[1, 2]
    tiz = 1.0 / zs
    tp = jnp.stack([u, v], axis=-1)  # (F, 3, 2)

    # face shading (headlight Lambertian on the camera-frame normal, two-sided)
    n = jnp.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    intensity = 0.35 + 0.65 * jnp.abs(n[:, 2])  # (F,)
    tcol = tri_colors * intensity[:, None, None]  # (F, 3, 3)

    x0, y0 = tp[:, 0, 0], tp[:, 0, 1]
    x1, y1 = tp[:, 1, 0], tp[:, 1, 1]
    x2, y2 = tp[:, 2, 0], tp[:, 2, 1]
    # signed doubled area; barycentric λ_i = E_i / (2A) with
    # E_0 = (y1-y2)x + (x2-x1)y + (x1 y2 - x2 y1), cyclic.
    area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    degenerate = jnp.abs(area2) < 1e-9
    inv_area2 = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, area2))

    a = jnp.stack([y1 - y2, y2 - y0, y0 - y1], axis=-1) * inv_area2[:, None]
    b = jnp.stack([x2 - x1, x0 - x2, x1 - x0], axis=-1) * inv_area2[:, None]
    c = (
        jnp.stack(
            [x1 * y2 - x2 * y1, x2 * y0 - x0 * y2, x0 * y1 - x1 * y0], axis=-1
        )
        * inv_area2[:, None]
    )

    # 1/z and color/z are affine: coeff = Σ_i λ_coeff_i * attr_i
    iz_a = (a * tiz).sum(-1)
    iz_b = (b * tiz).sum(-1)
    iz_c = (c * tiz).sum(-1)
    col_a = jnp.einsum("fi,fic->fc", a, tcol * tiz[:, :, None])
    col_b = jnp.einsum("fi,fic->fc", b, tcol * tiz[:, :, None])
    col_c = jnp.einsum("fi,fic->fc", c, tcol * tiz[:, :, None])

    xmin = jnp.min(tp[..., 0], axis=-1)
    xmax = jnp.max(tp[..., 0], axis=-1)
    ymin = jnp.min(tp[..., 1], axis=-1)
    ymax = jnp.max(tp[..., 1], axis=-1)

    valid = tri_valid & ~tbehind & ~degenerate
    return dict(
        lam_a=a, lam_b=b, lam_c=c,
        iz_abc=jnp.stack([iz_a, iz_b, iz_c], axis=-1),
        col_a=col_a, col_b=col_b, col_c=col_c,
        bbox=jnp.stack([xmin, ymin, xmax, ymax], axis=-1),
        valid=valid,
    )


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "tile", "max_tris_per_tile", "z_near"),
)
def rasterize(
    tri_verts: jax.Array,     # (B, F, 3, 3) object-frame per-triangle corners
    tri_valid: jax.Array,     # (B, F) bool
    TCO: jax.Array,           # (B, 4, 4) object→camera
    K: jax.Array,             # (B, 3, 3) intrinsics of the target frame
    image_size: tuple[int, int] = (240, 320),
    colors: jax.Array | None = None,  # (B, F, 3, 3) per-corner albedo in [0,1]
    tile: tuple[int, int] = (24, 64),
    max_tris_per_tile: int = 128,
    z_near: float = 0.05,
    tri_attr: jax.Array | None = None,  # (B, F) flat attribute (e.g. instance id)
) -> RenderOutput:
    """Render a batch of posed meshes under per-item intrinsics.

    Replaces BulletBatchRenderer.render (ref: bullet_batch_renderer.py:46-90):
    same contract — one object per batch item, object-frame mesh posed by TCO,
    rendered at `image_size` under K — but fully on-device. Geometry is
    triangle-major (unrolled corners, no vertex index indirection): dense,
    fixed-shape, gather-free in the per-pixel path.
    """
    H, W = image_size

    def fit(size, t):
        while size % t != 0:
            t -= 1
        return t

    th, tw = fit(H, tile[0]), fit(W, tile[1])
    nty, ntx = H // th, W // tw
    n_tiles = nty * ntx
    Kcap = min(max_tris_per_tile, tri_verts.shape[1])

    if colors is None:
        colors = jnp.full(tri_verts.shape, 0.7, dtype=tri_verts.dtype)

    # camera-frame triangle corners
    tv_cam = (
        jnp.einsum(
            "bij,bfvj->bfvi", TCO[:, :3, :3], tri_verts,
            precision=jax.lax.Precision.HIGHEST,
        )
        + TCO[:, None, None, :3, 3]
    )
    planes = jax.vmap(_triangle_planes, in_axes=(0, 0, 0, 0, None))(
        tv_cam, tri_valid, K, colors, z_near
    )

    # ---- binning: per tile, indices of up to Kcap overlapping triangles ----
    # tile t=(ty,tx) spans x ∈ [tx*tw, (tx+1)*tw), y ∈ [ty*th, (ty+1)*th)
    ty = jnp.arange(nty)
    tx = jnp.arange(ntx)
    tile_x0 = jnp.tile(tx * tw, nty).astype(jnp.float32)          # (n_tiles,)
    tile_y0 = jnp.repeat(ty * th, ntx).astype(jnp.float32)
    tile_x1 = tile_x0 + tw
    tile_y1 = tile_y0 + th

    bbox = planes["bbox"]  # (B, F, 4)
    valid = planes["valid"]  # (B, F)

    def bin_one(bbox_b, valid_b):
        # overlap (n_tiles, F)
        ov = (
            (bbox_b[None, :, 0] <= tile_x1[:, None])
            & (bbox_b[None, :, 2] >= tile_x0[:, None])
            & (bbox_b[None, :, 1] <= tile_y1[:, None])
            & (bbox_b[None, :, 3] >= tile_y0[:, None])
            & valid_b[None, :]
        )
        # fixed-size per-tile triangle lists: take the first Kcap overlapping
        # face ids (top_k over a key that ranks overlapping faces first, by id)
        F = bbox_b.shape[0]
        key = jnp.where(ov, -jnp.arange(F, dtype=jnp.float32)[None, :], -jnp.inf)
        _, idx = jax.lax.top_k(key, Kcap)  # (n_tiles, Kcap) face ids
        count_ok = jnp.take_along_axis(ov, idx, axis=1)  # (n_tiles, Kcap) bool
        return idx, count_ok

    tri_idx, tri_ok = jax.vmap(bin_one)(bbox, valid)  # (B, n_tiles, Kcap)

    # ---- per-tile rasterization, scanned over tiles ----
    px = jnp.arange(tw, dtype=jnp.float32) + 0.5  # pixel centers
    py = jnp.arange(th, dtype=jnp.float32) + 0.5

    def tile_step(carry, t):
        # gather this tile's triangle planes for all batch items: (B, Kcap, ...)
        idx_t = tri_idx[:, t]  # (B, Kcap)
        ok_t = tri_ok[:, t]    # (B, Kcap)
        take = lambda x: jnp.take_along_axis(
            x, idx_t.reshape(idx_t.shape + (1,) * (x.ndim - 2)), axis=1
        )
        attr_t = (
            jnp.take_along_axis(tri_attr, idx_t, axis=1)
            if tri_attr is not None else None
        )  # (B, Kcap)
        lam_a = take(planes["lam_a"])  # (B, Kcap, 3)
        lam_b = take(planes["lam_b"])
        lam_c = take(planes["lam_c"])
        iz_abc = take(planes["iz_abc"])  # (B, Kcap, 3)
        col_a = take(planes["col_a"])    # (B, Kcap, 3)
        col_b = take(planes["col_b"])
        col_c = take(planes["col_c"])

        # absolute pixel coordinates of this tile
        x = tile_x0[t] + px  # (tw,)
        y = tile_y0[t] + py  # (th,)
        xe = x[None, None, :, None]
        ye = y[None, :, None, None]

        # three barycentric planes evaluated on the tile, each (B, th, tw, K)
        # — kept as separate elementwise chains so XLA fuses them into one
        # VPU pass; no (..., 3)-stacked intermediate
        lam0 = lam_a[:, None, None, :, 0] * xe + lam_b[:, None, None, :, 0] * ye + lam_c[:, None, None, :, 0]
        lam1 = lam_a[:, None, None, :, 1] * xe + lam_b[:, None, None, :, 1] * ye + lam_c[:, None, None, :, 1]
        lam2 = lam_a[:, None, None, :, 2] * xe + lam_b[:, None, None, :, 2] * ye + lam_c[:, None, None, :, 2]
        inside = (
            (lam0 >= -1e-6) & (lam1 >= -1e-6) & (lam2 >= -1e-6)
            & ok_t[:, None, None, :]
        )  # (B, th, tw, K)

        izv = (
            iz_abc[:, None, None, :, 0] * xe
            + iz_abc[:, None, None, :, 1] * ye
            + iz_abc[:, None, None, :, 2]
        )  # (B, th, tw, K)
        izv = jnp.where(inside & (izv > 0), izv, 0.0)
        iz_win = jnp.max(izv, axis=-1)  # nearest surface (max 1/z)
        hit = iz_win > 0

        # winner selection WITHOUT gathers: exclusive one-hot over K, then the
        # color-plane coefficients of the winner come out of one K-contraction
        # (MXU) — colz = x·selA + y·selB + selC since the planes are affine
        eq = (izv == iz_win[..., None]) & hit[..., None]
        first = (jnp.cumsum(eq, axis=-1) == 1) & eq  # break ties: first winner
        w = first.astype(izv.dtype)  # (B, th, tw, K)
        B = w.shape[0]
        wf = w.reshape(B, -1, w.shape[-1])  # (B, th*tw, K)
        selA = jnp.matmul(wf, col_a).reshape(w.shape[:3] + (3,))
        selB = jnp.matmul(wf, col_b).reshape(w.shape[:3] + (3,))
        selC = jnp.matmul(wf, col_c).reshape(w.shape[:3] + (3,))
        colz = selA * xe[..., 0:1] + selB * ye[..., 0:1] + selC

        rgb = jnp.where(
            hit[..., None], colz / jnp.maximum(iz_win[..., None], 1e-12), 0.0
        )
        depth = jnp.where(hit, 1.0 / jnp.maximum(iz_win, 1e-12), 0.0)
        if attr_t is not None:
            attr = jnp.matmul(wf, attr_t[..., None]).reshape(w.shape[:3])
        else:
            attr = jnp.zeros_like(depth)
        return carry, (rgb, depth, hit, attr)

    _, (rgb_t, depth_t, hit_t, attr_t) = jax.lax.scan(
        tile_step, None, jnp.arange(n_tiles)
    )
    # reassemble (n_tiles, B, th, tw, ...) → (B, H, W, ...)
    def untile(x):
        extra = x.shape[4:]
        x = x.reshape((nty, ntx, -1, th, tw) + extra)
        x = jnp.moveaxis(x, 2, 0)  # (B, nty, ntx, th, tw, ...)
        x = jnp.swapaxes(x, 2, 3)  # (B, nty, th, ntx, tw, ...)
        return x.reshape((x.shape[0], nty * th, ntx * tw) + extra)

    rgb = jnp.clip(untile(rgb_t), 0.0, 1.0)
    depth = untile(depth_t)
    mask = untile(hit_t)
    attr = untile(attr_t) if tri_attr is not None else None
    return RenderOutput(
        rgb=jnp.moveaxis(rgb, -1, 1), depth=depth, mask=mask, attr=attr
    )
