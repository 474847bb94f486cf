import numpy as np
import jax.numpy as jnp

from cosypose_tpu.ops.rasterizer import rasterize


def make_K(bsz, fx=300.0, fy=300.0, cx=160.0, cy=120.0):
    K = np.zeros((bsz, 3, 3), np.float32)
    K[:, 0, 0], K[:, 1, 1] = fx, fy
    K[:, 0, 2], K[:, 1, 2] = cx, cy
    K[:, 2, 2] = 1.0
    return K


def cube_mesh(size=0.1):
    """Axis-aligned cube centered at origin: 8 verts, 12 triangles."""
    s = size / 2
    verts = np.array(
        [[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)],
        dtype=np.float32,
    )
    # faces of the cube (two triangles each), consistent outward winding
    quads = [
        (0, 1, 3, 2),  # x = -s
        (4, 6, 7, 5),  # x = +s
        (0, 4, 5, 1),  # y = -s
        (2, 3, 7, 6),  # y = +s
        (0, 2, 6, 4),  # z = -s
        (1, 5, 7, 3),  # z = +s
    ]
    tris = []
    for a, b, c, d in quads:
        tris.append((a, b, c))
        tris.append((a, c, d))
    return verts, np.asarray(tris, dtype=np.int32)


def test_cube_render_geometry():
    verts, tris = cube_mesh(0.1)
    B = 1
    TCO = np.eye(4, dtype=np.float32)[None]
    TCO[:, 2, 3] = 0.5  # cube 0.5m in front
    K = make_K(B)
    out = rasterize(
        jnp.asarray(verts[tris][None]),
        jnp.ones((B, tris.shape[0]), bool),
        jnp.asarray(TCO),
        jnp.asarray(K),
        image_size=(240, 320),
    )
    rgb = np.asarray(out.rgb)
    depth = np.asarray(out.depth)
    mask = np.asarray(out.mask)
    assert rgb.shape == (B, 3, 240, 320)

    # expected silhouette: cube face spans 0.1m at z=0.45..0.55 →
    # half-extent in px: 300*0.05/0.45 ≈ 33.3 (front face)
    assert mask[0, 120, 160]  # center hit
    assert mask[0, 120, 160 + 30]
    assert not mask[0, 120, 160 + 40]
    assert not mask[0, 10, 10]

    # depth at center = front face = 0.45
    assert abs(depth[0, 120, 160] - 0.45) < 1e-3
    # depth increases toward the face edge? front face is planar → constant z
    assert abs(depth[0, 120, 185] - 0.45) < 1e-3
    # rgb inside is nonzero
    assert rgb[:, :, 120, 160].min() > 0.05
    # background exactly 0
    assert rgb[0, :, 10, 10].max() == 0.0


def test_cube_render_depth_ordering():
    """Two cubes in one mesh at different depths — nearer one must win."""
    verts1, tris1 = cube_mesh(0.1)
    verts2 = verts1 + np.array([0.0, 0.0, 0.3], np.float32)  # farther
    verts = np.concatenate([verts1, verts2], axis=0)
    tris = np.concatenate([tris1, tris1 + 8], axis=0)
    TCO = np.eye(4, dtype=np.float32)[None]
    TCO[:, 2, 3] = 0.5
    K = make_K(1)
    out = rasterize(
        jnp.asarray(verts[tris][None]),
        jnp.ones((1, tris.shape[0]), bool),
        jnp.asarray(TCO),
        jnp.asarray(K),
        image_size=(240, 320),
    )
    depth = np.asarray(out.depth)
    assert abs(depth[0, 120, 160] - 0.45) < 1e-3  # near cube front face


def test_rasterize_matches_bruteforce_oracle():
    """Compare depth against a per-pixel brute-force ray-triangle oracle."""
    rng = np.random.RandomState(0)
    verts, tris = cube_mesh(0.12)
    # random rotation
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    TCO = np.eye(4, dtype=np.float32)[None]
    TCO[0, :3, :3] = Q
    TCO[0, :3, 3] = [0.02, -0.01, 0.6]
    K = make_K(1, fx=200, fy=200, cx=32, cy=24)
    H, W = 48, 64
    out = rasterize(
        jnp.asarray(verts[tris][None]),
        jnp.ones((1, tris.shape[0]), bool),
        jnp.asarray(TCO),
        jnp.asarray(K),
        image_size=(H, W),
        tile=(24, 64),
    )
    depth = np.asarray(out.depth)[0]

    # oracle: perspective-correct depth via barycentric interpolation of 1/z
    v_cam = verts @ Q.T + TCO[0, :3, 3]
    z = v_cam[:, 2]
    u = 200 * v_cam[:, 0] / z + 32
    v = 200 * v_cam[:, 1] / z + 24
    oracle = np.zeros((H, W))
    for j in range(H):
        for i in range(W):
            x, y = i + 0.5, j + 0.5
            best_iz = 0.0
            for t in tris:
                x0, y0, x1, y1, x2, y2 = u[t[0]], v[t[0]], u[t[1]], v[t[1]], u[t[2]], v[t[2]]
                d = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
                if abs(d) < 1e-12:
                    continue
                l0 = ((y1 - y2) * (x - x2) + (x2 - x1) * (y - y2)) / d * np.sign(1)
                # standard barycentric
                l0 = ((y1 - y2) * (x - x2) + (x2 - x1) * (y - y2)) / ((y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2))
                l1 = ((y2 - y0) * (x - x2) + (x0 - x2) * (y - y2)) / ((y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2))
                l2 = 1 - l0 - l1
                if l0 >= -1e-6 and l1 >= -1e-6 and l2 >= -1e-6:
                    iz = l0 / z[t[0]] + l1 / z[t[1]] + l2 / z[t[2]]
                    best_iz = max(best_iz, iz)
            oracle[j, i] = 1.0 / best_iz if best_iz > 0 else 0.0

    # agreement: same coverage except possibly a 1px boundary ring
    both = (depth > 0) & (oracle > 0)
    either = (depth > 0) | (oracle > 0)
    disagree = either & ~both
    assert disagree.sum() <= 0.02 * either.sum() + 5
    np.testing.assert_allclose(depth[both], oracle[both], atol=1e-3)
