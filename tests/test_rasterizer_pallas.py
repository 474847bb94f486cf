"""Differential test: Pallas kernel vs the XLA rasterizer (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from cosypose_tpu.ops.rasterizer import rasterize
from cosypose_tpu.ops.rasterizer_pallas import rasterize_pallas
from tests.test_rasterizer import cube_mesh, make_K


def test_pallas_matches_xla_rasterizer():
    rng = np.random.RandomState(0)
    verts, tris = cube_mesh(0.12)
    B = 3
    TCO = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    for b in range(B):
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        TCO[b, :3, :3] = Q
        TCO[b, :3, 3] = [rng.uniform(-0.03, 0.03), rng.uniform(-0.03, 0.03),
                         rng.uniform(0.45, 0.8)]
    K = make_K(B, fx=200, fy=200, cx=40, cy=24)
    tv = jnp.asarray(verts[tris][None].repeat(B, axis=0))
    valid = jnp.ones((B, tris.shape[0]), bool)

    ref = rasterize(tv, valid, jnp.asarray(TCO), jnp.asarray(K),
                    image_size=(48, 80))
    pal = rasterize_pallas(tv, valid, jnp.asarray(TCO), jnp.asarray(K),
                           image_size=(48, 80), interpret=True)

    np.testing.assert_allclose(np.asarray(pal.depth), np.asarray(ref.depth),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(pal.rgb), np.asarray(ref.rgb),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(pal.mask), np.asarray(ref.mask))


def test_pallas_attr_channel_matches_xla():
    """Instance-attribute channel parity: two cubes, distinct flat attrs."""
    rng = np.random.RandomState(1)
    verts, tris = cube_mesh(0.1)
    F = tris.shape[0]
    # two instances side by side, partially overlapping in screen space
    tv1 = verts[tris] + np.array([-0.04, 0.0, 0.6], np.float32)
    tv2 = verts[tris] + np.array([0.04, 0.01, 0.7], np.float32)
    tv = jnp.asarray(np.concatenate([tv1, tv2], axis=0)[None])
    valid = jnp.ones((1, 2 * F), bool)
    attr = jnp.asarray(
        np.concatenate([np.full(F, 1.0), np.full(F, 2.0)])[None].astype(np.float32)
    )
    TCO = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    K = make_K(1, fx=200, fy=200, cx=40, cy=24)

    ref = rasterize(tv, valid, TCO, jnp.asarray(K), image_size=(48, 80),
                    tri_attr=attr)
    pal = rasterize_pallas(tv, valid, TCO, jnp.asarray(K), image_size=(48, 80),
                           interpret=True, tri_attr=attr)

    np.testing.assert_allclose(np.asarray(pal.depth), np.asarray(ref.depth),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(pal.attr), np.asarray(ref.attr))
    assert set(np.unique(np.asarray(pal.attr))) == {0.0, 1.0, 2.0}


def test_pallas_chunk_binning_small_budget():
    """max_tris_per_tile smaller than F still renders the nearest surface."""
    verts, tris = cube_mesh(0.12)
    B = 2
    TCO = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    TCO[:, 2, 3] = [0.5, 0.7]
    K = make_K(B, fx=200, fy=200, cx=40, cy=24)
    tv = jnp.asarray(verts[tris][None].repeat(B, axis=0))
    valid = jnp.ones((B, tris.shape[0]), bool)
    ref = rasterize(tv, valid, jnp.asarray(TCO), jnp.asarray(K),
                    image_size=(48, 80))
    pal = rasterize_pallas(tv, valid, jnp.asarray(TCO), jnp.asarray(K),
                           image_size=(48, 80), interpret=True,
                           max_tris_per_tile=16)
    # 12-tri cube fits in a 16-budget; outputs must still match exactly
    np.testing.assert_allclose(np.asarray(pal.depth), np.asarray(ref.depth),
                               atol=1e-4)
