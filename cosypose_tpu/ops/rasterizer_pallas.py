"""Pallas TPU rasterizer kernels.

Same contract and math as ops/rasterizer.py (affine screen-space planes,
perspective-correct 1/z, headlight shading baked into color planes) but the
per-tile depth resolve runs as hand-written Mosaic kernels:

  * one grid cell per (batch item, tile); per-tile triangle-chunk COUNTS are
    scalar-prefetched, so the k-loop early-exits — empty tiles cost ~nothing,
    while the XLA version always evaluates max_tris_per_tile triangles per tile;
  * binning is CHUNK-granular: triangles are grouped into aligned chunks of 8
    (the kernels' consumption unit) and the per-tile top_k compaction runs over
    chunk AABBs — ~8x cheaper than per-triangle binning, which lets the default
    per-tile budget be 1024 triangles (measured overlap on a zoomed 2.2k-tri
    mesh peaks near 1000/strip; a 512 cap silently drops geometry);
  * the winner's flat per-triangle attribute (instance id for SceneRenderer /
    recording segmentation) rides a spare lane of the coefficient row, so the
    scene-rendering path stays on the fast kernel.

Kernel shape: full-width strip tiles (default 24x320, tuned on v5e — a
measured sweep over strip heights and lane splits: 48-row strips leave the
VPU evaluating each ~35 px^2 zoomed triangle over 15k strip pixels, while
sub-128-lane tiles go scalar-extract-bound, ~22 coefficient extracts per
triangle no longer hiding under the vector work; a sublane-parallel
"rowscan" variant measured 5x SLOWER than this formulation on real silicon
and was dropped). One triangle at a time: coefficients extracted to scalars
and broadcast over the strip, depth/color resolved in VMEM scratch.

The binning/plane setup is shared with the XLA rasterizer. Outputs are
bit-comparable to the XLA path up to float association order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterizer import RenderOutput, _triangle_planes

# packed coefficient layout per triangle (lane-padded to 24):
# 0:3 lam_a, 3:6 lam_b, 6:9 lam_c, 9:12 iz_abc,
# 12:15 col_a, 15:18 col_b, 18:21 col_c, 21 attr, 22:24 bbox y0/y1
_COEF_DIM = 24


def _kernel_broadcast(counts_ref, coef_ref, *out_and_scratch,
                      th, tw, ntx, with_attr):
    """One triangle at a time; scalar-broadcast coefficients over the tile."""
    if with_attr:
        rgb_ref, depth_ref, attr_ref, iz_scr, colz_scr, attr_scr = out_and_scratch
    else:
        rgb_ref, depth_ref, iz_scr, colz_scr = out_and_scratch
        attr_ref = attr_scr = None

    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    ty = t // ntx
    tx = t % ntx
    y0 = (ty * th).astype(jnp.float32)
    x0 = (tx * tw).astype(jnp.float32)

    xs = x0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32) + 0.5
    ys = y0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32) + 0.5

    iz_scr[:] = jnp.zeros((th, tw), jnp.float32)
    colz_scr[:] = jnp.zeros((3, th, tw), jnp.float32)
    if with_attr:
        attr_scr[:] = jnp.zeros((th, tw), jnp.float32)

    n_chunks = counts_ref[b * n_tiles + t]  # count of 8-triangle chunks

    # Rows of invalid / out-of-tile triangles are ZEROED by the host-side
    # packer, and an all-zero row is inert (izv == 0 never beats iz_scr >= 0
    # under strict >), so the chunk body runs unpredicated. (A per-triangle
    # @pl.when y-overlap skip keyed on packed bbox lanes was measured 3x
    # SLOWER than evaluating everything: the branch control-depends on
    # scalar extracts and serializes the vector pipeline.)
    def body(kc, _):
        rows = coef_ref[0, 0, pl.ds(kc * 8, 8), :]  # (8, _COEF_DIM)
        for j in range(8):
            row = rows[j]
            lam0 = row[0] * xs + row[3] * ys + row[6]
            lam1 = row[1] * xs + row[4] * ys + row[7]
            lam2 = row[2] * xs + row[5] * ys + row[8]
            izv = row[9] * xs + row[10] * ys + row[11]
            lmin = jnp.minimum(lam0, jnp.minimum(lam1, lam2))
            # strict > against iz_scr (init 0) subsumes the izv > 0 front test
            win = (lmin >= -1e-6) & (izv > iz_scr[:])
            iz_scr[:] = jnp.where(win, izv, iz_scr[:])
            for c in range(3):
                colz_c = row[12 + c] * xs + row[15 + c] * ys + row[18 + c]
                colz_scr[c] = jnp.where(win, colz_c, colz_scr[c])
            if with_attr:
                attr_scr[:] = jnp.where(win, row[21], attr_scr[:])
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    iz = iz_scr[:]
    hit = iz > 0.0
    safe_iz = jnp.maximum(iz, 1e-12)
    depth_ref[0, 0] = jnp.where(hit, 1.0 / safe_iz, 0.0)
    for c in range(3):
        rgb_ref[0, 0, c] = jnp.where(hit, colz_scr[c] / safe_iz, 0.0)
    if with_attr:
        attr_ref[0, 0] = jnp.where(hit, attr_scr[:], 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "tile", "max_tris_per_tile", "z_near",
                     "interpret"),
)
def rasterize_pallas(
    tri_verts: jax.Array,     # (B, F, 3, 3) object-frame per-triangle corners
    tri_valid: jax.Array,     # (B, F) bool
    TCO: jax.Array,           # (B, 4, 4)
    K: jax.Array,             # (B, 3, 3)
    image_size: tuple[int, int] = (240, 320),
    colors: jax.Array | None = None,
    tile: tuple[int, int] = (24, 320),
    max_tris_per_tile: int = 768,
    z_near: float = 0.05,
    interpret: bool = False,
    tri_attr: jax.Array | None = None,  # (B, F) flat attribute (instance id)
) -> RenderOutput:
    H, W = image_size
    B, F = tri_verts.shape[:2]
    with_attr = tri_attr is not None

    # canvas padding: tiles are lane/sublane aligned; the canvas is the image
    # rounded up to whole tiles and the output sliced back to (H, W). Binning
    # assigns almost nothing to pad-only tiles, so the cost is ~zero.
    th = min(tile[0], ((H + 7) // 8) * 8)
    tw = min(tile[1], ((W + 127) // 128) * 128)
    Hp = ((H + th - 1) // th) * th
    Wp = ((W + tw - 1) // tw) * tw
    nty, ntx = Hp // th, Wp // tw
    n_tiles = nty * ntx
    if colors is None:
        colors = jnp.full(tri_verts.shape, 0.7, dtype=tri_verts.dtype)

    # ---- shared plane setup (XLA) ----
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
    valid = planes["valid"]  # (B, F)

    # packed per-triangle coefficient rows (B, F, 24); invalid rows zeroed so
    # chunk-granular packing can keep them inert without per-row masks
    attr_col = (
        tri_attr.astype(jnp.float32)[..., None] if with_attr
        else jnp.zeros(planes["lam_a"].shape[:2] + (1,), planes["lam_a"].dtype)
    )
    coef = jnp.concatenate(
        [
            planes["lam_a"], planes["lam_b"], planes["lam_c"],
            planes["iz_abc"],
            planes["col_a"], planes["col_b"], planes["col_c"],
            attr_col,
            planes["bbox"][..., 1:2], planes["bbox"][..., 3:4],  # y0, y1
        ],
        axis=-1,
    )  # (B, F, 24)
    coef = jnp.where(valid[..., None], coef, 0.0)

    # ---- chunk-granular binning ----
    # Triangles are grouped into the kernels' 8-row consumption chunks; the
    # per-tile compaction (overlap test + top_k) runs over chunk AABBs.
    Fp = ((F + 7) // 8) * 8
    if Fp > F:
        coef = jnp.pad(coef, ((0, 0), (0, Fp - F), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, Fp - F)))
    C = Fp // 8
    bbox = planes["bbox"]
    if Fp > F:
        bbox = jnp.pad(bbox, ((0, 0), (0, Fp - F), (0, 0)))

    # y-sort before chunking: order triangles by projected y-center so the 8
    # consecutive triangles forming a chunk share a y-band. Mesh surface order
    # gives chunk AABBs of ~3-6x the triangle height; sorted chunks are
    # y-thin, which is what full-width strip binning keys on — measured ~35%
    # fewer kernel triangle-visits on the bench mesh soup. Invalid triangles
    # sort to the tail, compacting them out of live chunks. The depth resolve
    # is a strict max over 1/z, so triangle order does not change the image
    # (up to float-exact z ties).
    ykey = jnp.where(valid, 0.5 * (bbox[..., 1] + bbox[..., 3]), jnp.inf)
    order = jnp.argsort(ykey, axis=1)
    coef = jnp.take_along_axis(coef, order[..., None], axis=1)
    bbox = jnp.take_along_axis(bbox, order[..., None], axis=1)
    valid = jnp.take_along_axis(valid, order, axis=1)
    big = jnp.float32(1e9)
    bx0 = jnp.where(valid, bbox[..., 0], big).reshape(B, C, 8).min(-1)
    by0 = jnp.where(valid, bbox[..., 1], big).reshape(B, C, 8).min(-1)
    bx1 = jnp.where(valid, bbox[..., 2], -big).reshape(B, C, 8).max(-1)
    by1 = jnp.where(valid, bbox[..., 3], -big).reshape(B, C, 8).max(-1)
    cvalid = valid.reshape(B, C, 8).any(-1)

    Kc = (min(max_tris_per_tile, Fp) + 7) // 8  # per-tile chunk budget

    tile_x0 = jnp.tile(jnp.arange(ntx) * tw, nty).astype(jnp.float32)
    tile_y0 = jnp.repeat(jnp.arange(nty) * th, ntx).astype(jnp.float32)
    tile_x1 = tile_x0 + tw
    tile_y1 = tile_y0 + th

    def bin_one(bx0_b, by0_b, bx1_b, by1_b, cvalid_b):
        ov = (
            (bx0_b[None, :] <= tile_x1[:, None])
            & (bx1_b[None, :] >= tile_x0[:, None])
            & (by0_b[None, :] <= tile_y1[:, None])
            & (by1_b[None, :] >= tile_y0[:, None])
            & cvalid_b[None, :]
        )  # (n_tiles, C)
        key = jnp.where(ov, -jnp.arange(C, dtype=jnp.float32)[None, :], -jnp.inf)
        _, idx = jax.lax.top_k(key, min(Kc, C))
        if Kc > C:
            idx = jnp.concatenate(
                [idx, jnp.zeros((idx.shape[0], Kc - C), idx.dtype)], axis=1
            )
        ok = jnp.take_along_axis(ov, idx, axis=1)
        if Kc > C:
            ok = ok.at[:, C:].set(False)
        counts = ok.sum(axis=1).astype(jnp.int32)
        return idx, ok, counts

    chunk_idx, chunk_ok, counts = jax.vmap(bin_one)(bx0, by0, bx1, by1, cvalid)

    # gather chunk coefficient rows: (B, n_tiles, Kc, 8*24) -> (B, n_tiles, Kc*8, 24)
    coef_c = coef.reshape(B, C, 8 * _COEF_DIM)
    coef_tiled = jnp.take_along_axis(
        coef_c[:, None], chunk_idx[..., None], axis=2
    )
    # zero gathered chunks past each tile's count — the kernels' chunk loops
    # rely on inert zero rows instead of per-triangle predication
    coef_tiled = jnp.where(chunk_ok[..., None], coef_tiled, 0.0)
    coef_tiled = coef_tiled.reshape(B, n_tiles, Kc * 8, _COEF_DIM)

    out_shapes = [
        jax.ShapeDtypeStruct((B, n_tiles, 3, th, tw), jnp.float32),
        jax.ShapeDtypeStruct((B, n_tiles, th, tw), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, 3, th, tw), lambda b, t, counts: (b, t, 0, 0, 0)),
        pl.BlockSpec((1, 1, th, tw), lambda b, t, counts: (b, t, 0, 0)),
    ]
    if with_attr:
        out_shapes.append(jax.ShapeDtypeStruct((B, n_tiles, th, tw), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 1, th, tw), lambda b, t, counts: (b, t, 0, 0))
        )

    kernel = functools.partial(
        _kernel_broadcast, th=th, tw=tw, ntx=ntx, with_attr=with_attr
    )
    scratch_shapes = [
        pltpu.VMEM((th, tw), jnp.float32),
        pltpu.VMEM((3, th, tw), jnp.float32),
    ]
    if with_attr:
        scratch_shapes.append(pltpu.VMEM((th, tw), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, Kc * 8, _COEF_DIM),
                lambda b, t, counts: (b, t, 0, 0),
            ),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(counts.reshape(-1), coef_tiled)
    rgb_t, depth_t = outs[0], outs[1]
    attr_t = outs[2] if with_attr else None

    # reassemble tiles → images, slice off canvas padding
    def untile(x, extra_leading):
        # x: (B, n_tiles, [C,] th, tw)
        if extra_leading:
            x = x.reshape(B, nty, ntx, 3, th, tw)
            x = jnp.transpose(x, (0, 3, 1, 4, 2, 5))
            return x.reshape(B, 3, Hp, Wp)[:, :, :H, :W]
        x = x.reshape(B, nty, ntx, th, tw)
        x = jnp.transpose(x, (0, 1, 3, 2, 4))
        return x.reshape(B, Hp, Wp)[:, :H, :W]

    rgb = jnp.clip(untile(rgb_t, True), 0.0, 1.0)
    depth = untile(depth_t, False)
    attr = untile(attr_t, False) if with_attr else None
    return RenderOutput(rgb=rgb, depth=depth, mask=depth > 0, attr=attr)
