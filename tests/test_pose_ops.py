import numpy as np
import jax.numpy as jnp

from cosypose_tpu.ops import (
    apply_imagespace_predictions,
    TCO_init_from_boxes,
    TCO_init_from_boxes_zup_autodepth,
    project_points,
)


def make_K(bsz, fx=600.0, fy=600.0, cx=320.0, cy=240.0):
    K = np.zeros((bsz, 3, 3), np.float32)
    K[:, 0, 0], K[:, 1, 1] = fx, fy
    K[:, 0, 2], K[:, 1, 2] = cx, cy
    K[:, 2, 2] = 1.0
    return jnp.asarray(K)


def test_identity_update_is_noop():
    K = make_K(2)
    T = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    T[:, :3, 3] = [[0.1, -0.05, 1.2], [0.0, 0.2, 0.8]]
    v = jnp.asarray([[0.0, 0.0, 1.0]] * 2)  # vz=1 → depth unchanged
    dR = jnp.tile(jnp.eye(3), (2, 1, 1))
    out = apply_imagespace_predictions(jnp.asarray(T), K, v, dR)
    np.testing.assert_allclose(np.asarray(out), T, atol=1e-6)


def test_vz_scales_depth():
    K = make_K(1)
    T = np.eye(4, dtype=np.float32)[None]
    T[:, 2, 3] = 1.0
    v = jnp.asarray([[0.0, 0.0, 0.5]])
    out = apply_imagespace_predictions(jnp.asarray(T), K, v, jnp.eye(3)[None])
    assert abs(float(out[0, 2, 3]) - 0.5) < 1e-6
    # xy at 0 remains 0
    np.testing.assert_allclose(np.asarray(out[0, :2, 3]), [0, 0], atol=1e-6)


def test_vxvy_moves_projection_by_one_focal_unit():
    """vx=f*du/z semantics: moving vx by 1 moves the projected center by 1 pixel
    when fx=f and the depth is unchanged."""
    K = make_K(1)
    T = np.eye(4, dtype=np.float32)[None]
    T[:, 2, 3] = 1.0
    v = jnp.asarray([[1.0, 0.0, 1.0]])
    out = apply_imagespace_predictions(jnp.asarray(T), K, v, jnp.eye(3)[None])
    uv0 = project_points(jnp.zeros((1, 1, 3)), K, jnp.asarray(T))
    uv1 = project_points(jnp.zeros((1, 1, 3)), K, out)
    du = np.asarray(uv1 - uv0)[0, 0]
    np.testing.assert_allclose(du, [1.0, 0.0], atol=1e-4)


def test_rotation_premultiplied():
    K = make_K(1)
    T = np.eye(4, dtype=np.float32)[None]
    T[:, 2, 3] = 1.0
    a = 0.3
    dR = jnp.asarray(
        [[[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]],
        dtype=jnp.float32,
    )
    v = jnp.asarray([[0.0, 0.0, 1.0]])
    out = apply_imagespace_predictions(jnp.asarray(T), K, v, dR)
    np.testing.assert_allclose(np.asarray(out[0, :3, :3]), np.asarray(dR[0]), atol=1e-6)


def test_TCO_init_from_boxes():
    K = make_K(1)
    boxes = jnp.asarray([[300.0, 220.0, 340.0, 260.0]])  # centered on principal pt
    T = TCO_init_from_boxes(boxes, K, z_range=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(T[0, :3, 3]), [0.0, 0.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(T[0, :3, :3]), np.eye(3), atol=1e-6)
    # offset box: center at (420, 240) → x = (420-320)*1/600
    boxes = jnp.asarray([[400.0, 220.0, 440.0, 260.0]])
    T = TCO_init_from_boxes(boxes, K, z_range=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(T[0, :3, 3]), [100 / 600, 0.0, 1.0], atol=1e-5)


def test_TCO_init_zup_autodepth_recovers_depth():
    """A 0.1m cube seen at z=2 projects to a box of ~600*0.1/2=30px; the
    autodepth init should recover z≈2 from that box."""
    K = make_K(1)
    z_true = 2.0
    # cube corner points
    c = 0.05
    corners = np.array(
        [[x, y, z] for x in (-c, c) for y in (-c, c) for z in (-c, c)],
        dtype=np.float32,
    )[None]
    # true pose: z-up canonical rotation (same R the init assumes) at center
    R = np.array([[0, 1, 0], [0, 0, -1], [-1, 0, 0]], np.float32)
    T = np.eye(4, dtype=np.float32)[None]
    T[0, :3, :3] = R
    T[0, 2, 3] = z_true
    uv = np.asarray(project_points(jnp.asarray(corners), K, jnp.asarray(T)))
    box = np.array(
        [[uv[0, :, 0].min(), uv[0, :, 1].min(), uv[0, :, 0].max(), uv[0, :, 1].max()]],
        np.float32,
    )
    T_init = TCO_init_from_boxes_zup_autodepth(jnp.asarray(box), jnp.asarray(corners), K)
    assert abs(float(T_init[0, 2, 3]) - z_true) < 0.15
    np.testing.assert_allclose(np.asarray(T_init[0, :3, :3]), R, atol=1e-6)
