import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosypose_tpu.ops import (
    transform_pts,
    invert_T,
    rot6d_to_matrix,
    quat_to_matrix,
    euler_to_matrix,
    pose9d_to_T,
    T_to_pose9d,
    add_pose_noise,
)
from cosypose_tpu.ops.transforms import make_T, matrix_to_rot6d


def random_T(rng, bsz):
    """Random valid SE(3) batch via QR-orthonormalized rotations."""
    A = rng.normal(size=(bsz, 3, 3))
    Q, R = np.linalg.qr(A)
    det = np.linalg.det(Q)
    Q[:, :, 0] *= det[:, None]  # ensure det=+1
    T = np.tile(np.eye(4, dtype=np.float32), (bsz, 1, 1))
    T[:, :3, :3] = Q
    T[:, :3, 3] = rng.normal(scale=0.5, size=(bsz, 3))
    return T.astype(np.float32)


def test_transform_pts_matches_homogeneous():
    rng = np.random.RandomState(0)
    T = random_T(rng, 4)
    pts = rng.normal(size=(4, 17, 3)).astype(np.float32)
    out = transform_pts(jnp.asarray(T), jnp.asarray(pts))
    # homogeneous-coordinates oracle
    pts_h = np.concatenate([pts, np.ones((4, 17, 1), np.float32)], axis=-1)
    expected = np.einsum("bij,bpj->bpi", T, pts_h)[..., :3]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_transform_pts_symmetry_axis():
    rng = np.random.RandomState(1)
    T = random_T(rng, 3)
    S = np.stack([random_T(rng, 5) for _ in range(3)])  # (3, 5, 4, 4)
    pts = rng.normal(size=(3, 9, 3)).astype(np.float32)
    out = transform_pts(jnp.asarray(S), jnp.asarray(pts))
    assert out.shape == (3, 5, 9, 3)
    for b in range(3):
        for s in range(5):
            exp = transform_pts(jnp.asarray(S[b, s][None]), jnp.asarray(pts[b][None]))
            np.testing.assert_allclose(np.asarray(out[b, s]), np.asarray(exp[0]), atol=1e-5)
    del T


def test_invert_T():
    rng = np.random.RandomState(2)
    T = jnp.asarray(random_T(rng, 6))
    I = T @ invert_T(T)
    np.testing.assert_allclose(
        np.asarray(I), np.tile(np.eye(4), (6, 1, 1)), atol=1e-5
    )


def test_rot6d_valid_rotation():
    rng = np.random.RandomState(3)
    r6 = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    R = rot6d_to_matrix(r6)
    RtR = jnp.swapaxes(R, -1, -2) @ R
    np.testing.assert_allclose(np.asarray(RtR), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), np.ones(8), atol=1e-5)


def test_rot6d_identity_on_rotation_columns():
    # feeding the first two columns of a rotation matrix must reproduce it
    rng = np.random.RandomState(4)
    T = random_T(rng, 5)
    R = jnp.asarray(T[:, :3, :3])
    r6 = matrix_to_rot6d(R)
    np.testing.assert_allclose(np.asarray(rot6d_to_matrix(r6)), np.asarray(R), atol=1e-5)


def test_quat_to_matrix_known_values():
    # identity quat
    q = jnp.asarray([[0.0, 0.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(quat_to_matrix(q))[0], np.eye(3), atol=1e-6)
    # 90° about z: q = (0, 0, sin45, cos45)
    s = np.sin(np.pi / 4)
    q = jnp.asarray([[0.0, 0.0, s, s]])
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(np.asarray(quat_to_matrix(q))[0], expected, atol=1e-6)
    # unnormalized input is normalized first
    q2 = jnp.asarray([[0.0, 0.0, 3.0, 3.0]])
    np.testing.assert_allclose(np.asarray(quat_to_matrix(q2))[0], expected, atol=1e-6)


def test_euler_to_matrix_matches_axis_rotations():
    # sxyz convention: R = Rz @ Ry @ Rx
    a = 0.3
    Rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
    out = euler_to_matrix(jnp.asarray([a, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out), Rx, atol=1e-6)
    Rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
    out = euler_to_matrix(jnp.asarray([0.0, 0.0, a]))
    np.testing.assert_allclose(np.asarray(out), Rz, atol=1e-6)
    # composition order
    b, c = 0.2, -0.4
    Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
    Rz2 = np.array([[np.cos(c), -np.sin(c), 0], [np.sin(c), np.cos(c), 0], [0, 0, 1]])
    out = euler_to_matrix(jnp.asarray([a, b, c]))
    np.testing.assert_allclose(np.asarray(out), Rz2 @ Ry @ Rx, atol=1e-6)


def test_pose9d_roundtrip():
    rng = np.random.RandomState(5)
    T = jnp.asarray(random_T(rng, 7))
    T2 = pose9d_to_T(T_to_pose9d(T))
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-5)


def test_add_pose_noise_statistics():
    rng = np.random.RandomState(6)
    T = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (4096, 1, 1)))
    key = jax.random.PRNGKey(0)
    noisy = add_pose_noise(key, T, euler_deg_std=(15, 15, 15), trans_std=(0.01, 0.01, 0.05))
    t = np.asarray(noisy[:, :3, 3])
    assert abs(t[:, 0].std() - 0.01) < 0.002
    assert abs(t[:, 2].std() - 0.05) < 0.01
    R = np.asarray(noisy[:, :3, :3])
    RtR = np.einsum("bij,bik->bjk", R, R)
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (4096, 1, 1)), atol=1e-4)
    del rng


def test_make_T_shape():
    R = jnp.eye(3)[None]
    t = jnp.asarray([[1.0, 2.0, 3.0]])
    T = make_T(R, t)
    assert T.shape == (1, 4, 4)
    np.testing.assert_allclose(np.asarray(T[0, :3, 3]), [1, 2, 3])
    np.testing.assert_allclose(np.asarray(T[0, 3]), [0, 0, 0, 1])


def test_transform_class():
    from cosypose_tpu.ops.transform import Transform

    # quaternion constructor: 90° about z
    s = np.sin(np.pi / 4)
    T = Transform(np.array([0, 0, s, s]), (1.0, 2.0, 3.0))
    expected_R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(T.rotation, expected_R, atol=1e-9)
    np.testing.assert_allclose(T.translation, [1, 2, 3])
    # composition and inverse
    I = T * T.inverse()
    np.testing.assert_allclose(I.toHomogeneousMatrix(), np.eye(4), atol=1e-12)
    # quaternion round-trip
    q = T.quaternion
    T2 = Transform(q, T.translation)
    np.testing.assert_allclose(T2.rotation, T.rotation, atol=1e-9)
    # matrix constructor
    T3 = Transform(T.toHomogeneousMatrix())
    np.testing.assert_allclose(T3.translation, T.translation)


def test_temp_numpy_seed():
    from cosypose_tpu.utils.misc import temp_numpy_seed

    with temp_numpy_seed(0):
        a = np.random.rand(3)
    with temp_numpy_seed(0):
        b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
