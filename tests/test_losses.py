import numpy as np
import jax.numpy as jnp

from cosypose_tpu.ops import (
    loss_CO_symmetric,
    loss_refiner_CO_disentangled,
    compute_ADD_L1_loss,
    compute_ADDS_loss,
    symmetric_distance_batched_fast,
    mesh_points_dist,
    chamfer_dist,
)
from cosypose_tpu.ops.transforms import make_T, matrix_to_rot6d


def rotz(a):
    return np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
        dtype=np.float32,
    )


def eye4(bsz):
    return np.tile(np.eye(4, dtype=np.float32), (bsz, 1, 1))


def test_add_l1_zero_for_equal_poses():
    rng = np.random.RandomState(0)
    T = eye4(3)
    pts = rng.normal(size=(3, 30, 3)).astype(np.float32)
    loss = compute_ADD_L1_loss(jnp.asarray(T), jnp.asarray(T), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-7)


def test_add_l1_pure_translation():
    rng = np.random.RandomState(1)
    T1 = eye4(1)
    T2 = eye4(1)
    T2[0, :3, 3] = [0.3, 0.0, 0.0]
    pts = rng.normal(size=(1, 30, 3)).astype(np.float32)
    loss = compute_ADD_L1_loss(jnp.asarray(T1), jnp.asarray(T2), jnp.asarray(pts))
    # mean |dxyz| = 0.3/3 (only x differs)
    np.testing.assert_allclose(np.asarray(loss), 0.1, atol=1e-6)


def test_adds_zero_for_symmetric_rotation():
    """A ring of points symmetric under 90° z-rotation: ADD-S ≈ 0 even though the
    pose differs by that rotation."""
    angles = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    pts = np.stack([np.cos(angles), np.sin(angles), np.zeros(8)], axis=-1)[None].astype(
        np.float32
    )
    T1 = eye4(1)
    T2 = eye4(1)
    T2[0, :3, :3] = rotz(2 * np.pi / 8)
    loss = compute_ADDS_loss(jnp.asarray(T1), jnp.asarray(T2), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-10)
    # plain ADD is non-zero
    add = compute_ADD_L1_loss(jnp.asarray(T1), jnp.asarray(T2), jnp.asarray(pts))
    assert float(add[0]) > 0.1


def test_loss_CO_symmetric_picks_best_sym():
    rng = np.random.RandomState(2)
    pts = rng.normal(size=(1, 20, 3)).astype(np.float32)
    T_gt = eye4(1)
    a = 0.7
    T_sym = eye4(1)
    T_sym[0, :3, :3] = rotz(a)
    TCO_possible = np.stack([T_gt, T_sym], axis=1)  # (1, 2, 4, 4)
    # prediction equals the symmetric variant → loss 0
    loss = loss_CO_symmetric(
        jnp.asarray(TCO_possible), jnp.asarray(T_sym), jnp.asarray(pts)
    )
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-6)


def test_disentangled_loss_zero_at_gt():
    """If the network outputs exactly the GT delta, all three hypotheses equal GT
    and the loss is 0."""
    rng = np.random.RandomState(3)
    pts = rng.normal(scale=0.05, size=(1, 50, 3)).astype(np.float32)
    K = np.zeros((1, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 600
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = 320, 240, 1

    T_input = eye4(1)
    T_input[0, :3, 3] = [0.02, -0.01, 1.1]
    T_gt = eye4(1)
    T_gt[0, :3, :3] = rotz(0.2)
    T_gt[0, :3, 3] = [0.04, 0.01, 0.9]

    # exact delta the model should output:
    dR = T_gt[0, :3, :3] @ T_input[0, :3, :3].T
    vz = T_gt[0, 2, 3] / T_input[0, 2, 3]
    vx = (T_gt[0, 0, 3] / T_gt[0, 2, 3] - T_input[0, 0, 3] / T_input[0, 2, 3]) * 600
    vy = (T_gt[0, 1, 3] / T_gt[0, 2, 3] - T_input[0, 1, 3] / T_input[0, 2, 3]) * 600
    r6 = matrix_to_rot6d(jnp.asarray(dR[None]))
    outputs = jnp.concatenate([r6, jnp.asarray([[vx, vy, vz]])], axis=-1)

    loss = loss_refiner_CO_disentangled(
        jnp.asarray(T_gt[:, None]),  # single symmetry: GT itself
        jnp.asarray(T_input),
        outputs,
        jnp.asarray(K),
        jnp.asarray(pts),
    )
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-5)


def test_symmetric_distance_batched_fast():
    angles = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    pts = np.stack([np.cos(angles), np.sin(angles), np.zeros(6)], axis=-1)[None].astype(
        np.float32
    )
    syms = np.stack([np.eye(4), np.eye(4)], axis=0)[None].astype(np.float32)
    syms[0, 1, :3, :3] = rotz(2 * np.pi / 6)
    T1 = eye4(1)
    T2 = eye4(1)
    T2[0, :3, :3] = rotz(2 * np.pi / 6)
    d, S12 = symmetric_distance_batched_fast(
        jnp.asarray(T1), jnp.asarray(T2), jnp.asarray(pts), jnp.asarray(syms)
    )
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(S12[0]), syms[0, 1], atol=1e-6)


def test_mesh_points_dist_translation():
    pts = np.zeros((1, 10, 3), np.float32)
    T1 = eye4(1)
    T2 = eye4(1)
    T2[0, :3, 3] = [3.0, 4.0, 0.0]
    d = mesh_points_dist(jnp.asarray(T1), jnp.asarray(T2), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(d), 5.0, atol=1e-6)


def test_chamfer_zero_same_pose():
    rng = np.random.RandomState(4)
    pts = rng.normal(size=(2, 15, 3)).astype(np.float32)
    T = jnp.asarray(eye4(2))
    d = chamfer_dist(T, T, jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_aux_regression_zero_at_optimal_and_floor_at_identity():
    """The aux L2 regression loss (ops/losses.py:loss_refiner_aux_regression)
    is zero when the head outputs the closed-form optimal delta, and equals
    the squared pose error (meters²) when the head outputs identity."""
    from cosypose_tpu.ops import loss_refiner_aux_regression
    from cosypose_tpu.ops.transforms import matrix_to_rot6d

    K = np.zeros((1, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 600
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = 320, 240, 1
    T_input = eye4(1)
    T_input[0, :3, 3] = [0.02, -0.01, 1.1]
    T_gt = eye4(1)
    T_gt[0, :3, :3] = rotz(0.2)
    T_gt[0, :3, 3] = [0.04, 0.01, 0.9]

    dR = T_gt[0, :3, :3] @ T_input[0, :3, :3].T
    vz = T_gt[0, 2, 3] / T_input[0, 2, 3]
    vx = (T_gt[0, 0, 3] / T_gt[0, 2, 3] - T_input[0, 0, 3] / T_input[0, 2, 3]) * 600
    vy = (T_gt[0, 1, 3] / T_gt[0, 2, 3] - T_input[0, 1, 3] / T_input[0, 2, 3]) * 600
    r6 = matrix_to_rot6d(jnp.asarray(dR[None]))
    optimal = jnp.concatenate([r6, jnp.asarray([[vx, vy, vz]])], axis=-1)
    loss_opt = loss_refiner_aux_regression(
        jnp.asarray(T_gt), jnp.asarray(T_input), optimal, jnp.asarray(K)
    )
    np.testing.assert_allclose(np.asarray(loss_opt), 0.0, atol=1e-6)

    identity = jnp.concatenate(
        [matrix_to_rot6d(jnp.eye(3)[None]), jnp.asarray([[0.0, 0.0, 1.0]])],
        axis=-1,
    )
    loss_id = float(
        loss_refiner_aux_regression(
            jnp.asarray(T_gt), jnp.asarray(T_input), identity, jnp.asarray(K),
            rot_lever_m=0.05,
        )[0]
    )
    # identity residuals: d_xy relates to the xy/z offsets scaled to meters at
    # z_gt; d_z = z_gt - z_in; rotation Frobenius scaled by the lever arm
    d_xy = (
        np.array([T_gt[0, 0, 3] / T_gt[0, 2, 3] - T_input[0, 0, 3] / T_input[0, 2, 3],
                  T_gt[0, 1, 3] / T_gt[0, 2, 3] - T_input[0, 1, 3] / T_input[0, 2, 3]])
        * T_gt[0, 2, 3]
    )
    expect = (
        (d_xy**2).sum()
        + (T_gt[0, 2, 3] - T_input[0, 2, 3]) ** 2
        + 0.05**2 * ((np.eye(3) - dR) ** 2).sum()
    )
    np.testing.assert_allclose(loss_id, expect, rtol=1e-5)
