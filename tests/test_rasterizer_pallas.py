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
