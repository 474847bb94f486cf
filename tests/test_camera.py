import numpy as np
import jax.numpy as jnp

from cosypose_tpu.ops import (
    project_points,
    project_points_robust,
    boxes_from_uv,
    get_K_crop_resize,
)


def make_K(bsz, fx=600.0, fy=600.0, cx=320.0, cy=240.0):
    K = np.zeros((bsz, 3, 3), np.float32)
    K[:, 0, 0], K[:, 1, 1] = fx, fy
    K[:, 0, 2], K[:, 1, 2] = cx, cy
    K[:, 2, 2] = 1.0
    return K


def test_project_points_pinhole_oracle():
    rng = np.random.RandomState(0)
    K = make_K(2)
    T = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    T[:, 2, 3] = 1.0  # object 1m in front
    pts = rng.uniform(-0.05, 0.05, size=(2, 50, 3)).astype(np.float32)
    uv = project_points(jnp.asarray(pts), jnp.asarray(K), jnp.asarray(T))
    pts_cam = pts + T[:, None, :3, 3]
    expected_u = K[:, None, 0, 0] * pts_cam[..., 0] / pts_cam[..., 2] + K[:, None, 0, 2]
    expected_v = K[:, None, 1, 1] * pts_cam[..., 1] / pts_cam[..., 2] + K[:, None, 1, 2]
    np.testing.assert_allclose(np.asarray(uv[..., 0]), expected_u, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(uv[..., 1]), expected_v, rtol=1e-3)


def test_project_points_center():
    K = make_K(1)
    T = np.eye(4, dtype=np.float32)[None]
    T[:, 2, 3] = 2.0
    uv = project_points(jnp.zeros((1, 1, 3)), jnp.asarray(K), jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(uv[0, 0]), [320.0, 240.0], atol=1e-4)


def test_project_points_robust_clamps_depth():
    K = make_K(1)
    T = np.eye(4, dtype=np.float32)[None]
    T[:, 2, 3] = -5.0  # behind the camera
    uv = project_points_robust(
        jnp.zeros((1, 1, 3)), jnp.asarray(K), jnp.asarray(T), z_min=0.1
    )
    assert np.isfinite(np.asarray(uv)).all()


def test_boxes_from_uv():
    uv = jnp.asarray([[[1.0, 2.0], [5.0, -3.0], [2.0, 8.0]]])
    box = np.asarray(boxes_from_uv(uv))
    np.testing.assert_allclose(box[0], [1.0, -3.0, 5.0, 8.0])


def test_K_crop_resize_identity():
    # crop = full image at the same size → focal unchanged; the principal point
    # shifts by the fixed 0.5px pixel-center-convention offset of the formula
    K = make_K(1)
    boxes = jnp.asarray([[0.0, 0.0, 640.0, 480.0]])
    newK = np.asarray(get_K_crop_resize(jnp.asarray(K), boxes, (480, 640), (480, 640)))
    assert abs(newK[0, 0, 0] - 600.0) < 1e-3
    assert abs(newK[0, 1, 1] - 600.0) < 1e-3
    assert abs(newK[0, 0, 2] - 319.5) < 1e-3
    assert abs(newK[0, 1, 2] - 239.5) < 1e-3


def test_K_crop_resize_scale():
    # half-size crop centered at the principal point upsampled to full size:
    # focal doubles, principal point stays at the output center
    K = make_K(1)
    boxes = jnp.asarray([[160.0, 120.0, 480.0, 360.0]])
    newK = np.asarray(get_K_crop_resize(jnp.asarray(K), boxes, (480, 640), (480, 640)))
    assert abs(newK[0, 0, 0] - 1200.0) < 1e-2
    assert abs(newK[0, 1, 1] - 1200.0) < 1e-2
    # principal point of the crop: cx was at crop center → output center
    assert abs(newK[0, 0, 2] - (640 - 1) / 2) < 1.1
    assert abs(newK[0, 1, 2] - (480 - 1) / 2) < 1.1


def test_K_crop_projection_consistency():
    """Projecting with (K, full image) and (K_crop, crop frame) must agree:
    uv_crop == (uv - box_min) * scale, for points near the crop center."""
    rng = np.random.RandomState(3)
    K = make_K(1)
    T = np.eye(4, dtype=np.float32)[None]
    T[:, 2, 3] = 1.0
    pts = rng.uniform(-0.03, 0.03, (1, 20, 3)).astype(np.float32)
    uv = np.asarray(project_points(jnp.asarray(pts), jnp.asarray(K), jnp.asarray(T)))

    box = np.array([[200.0, 150.0, 440.0, 330.0]], np.float32)  # 240x180 -> 320x240
    newK = get_K_crop_resize(jnp.asarray(K), jnp.asarray(box), (480, 640), (240, 320))
    uv_crop = np.asarray(project_points(jnp.asarray(pts), newK, jnp.asarray(T)))

    scale_x = 320.0 / (box[0, 2] - box[0, 0])
    scale_y = 240.0 / (box[0, 3] - box[0, 1])
    # reference convention: pixel-center-aware mapping
    exp_u = (uv[..., 0] - (box[0, 0] + box[0, 2]) / 2 + (box[0, 2] - box[0, 0] - 1) / 2) * scale_x \
        + (320 - 1) / 2 - scale_x * ((box[0, 2] - box[0, 0] - 1) / 2)
    exp_u = exp_u + 0  # simplified below
    # direct check with the same formula the implementation derives from:
    cx = K[0, 0, 2] + (box[0, 2] - box[0, 0] - 1) / 2 - (box[0, 0] + box[0, 2]) / 2
    fx = K[0, 0, 0]
    u_in_crop = uv[..., 0] - K[0, 0, 2] + cx
    exp_u2 = (320 - 1) / 2 + scale_x * (u_in_crop - (box[0, 2] - box[0, 0] - 1) / 2)
    np.testing.assert_allclose(uv_crop[..., 0], exp_u2, atol=1e-2)
