import numpy as np
import jax
import jax.numpy as jnp

from cosypose_tpu.models import PosePredictor, PosePredictorConfig
from cosypose_tpu.ops.mesh_db import MeshSpec, build_mesh_db
from cosypose_tpu.models.pose_predictor import gather_mesh_data


def cube_specs():
    s = 0.05
    verts = np.array(
        [[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)],
        dtype=np.float64,
    ) * 1000.0  # mm units
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    tris = []
    for a, b, c, d in quads:
        tris.append((a, b, c))
        tris.append((a, c, d))
    return [
        MeshSpec(label="obj_000001", vertices=verts, faces=np.asarray(tris)),
        MeshSpec(label="obj_000002", vertices=verts * 1.5, faces=np.asarray(tris)),
    ]


def make_K(bsz, f=300.0, cx=80.0, cy=60.0):
    K = np.zeros((bsz, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = f
    K[:, 0, 2], K[:, 1, 2] = cx, cy
    K[:, 2, 2] = 1
    return jnp.asarray(K)


def small_cfg():
    return PosePredictorConfig(
        backbone="efficientnet-b0",
        render_size=(48, 64),
        n_points_crop=8,
        raster_tile=(24, 64),
        raster_max_tris_per_tile=16,
    )


def test_pose_predictor_forward_shapes():
    cfg = small_cfg()
    pp = PosePredictor(cfg)
    variables = pp.init(jax.random.PRNGKey(0))

    db = build_mesh_db(cube_specs())
    B = 2
    label_ids = jnp.asarray([0, 1])
    mesh_data = gather_mesh_data(db, label_ids, n_points_crop=cfg.n_points_crop)

    images = jnp.zeros((B, 3, 120, 160), jnp.float32)
    K = make_K(B)
    TCO = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    TCO[:, 2, 3] = 0.5
    outs = pp.forward(variables, mesh_data, images, K, jnp.asarray(TCO), n_iterations=2)

    assert outs["TCO_final"].shape == (B, 4, 4)
    assert outs["TCO_input"].shape == (2, B, 4, 4)
    assert outs["pose_outputs"].shape == (2, B, 9)
    assert outs["K_crop"].shape == (2, B, 3, 3)
    # chained iterations: iteration 2's input == iteration 1's output
    np.testing.assert_allclose(
        np.asarray(outs["TCO_input"][1]), np.asarray(outs["TCO_output"][0]), atol=1e-6
    )
    # output poses are valid SE(3)
    R = np.asarray(outs["TCO_final"][:, :3, :3])
    RtR = np.einsum("bij,bik->bjk", R, R)
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (B, 1, 1)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(outs["TCO_final"][:, 3]), [[0, 0, 0, 1]] * B, atol=1e-6)


def test_pose_predictor_train_mode_grads():
    cfg = small_cfg()
    pp = PosePredictor(cfg)
    variables = pp.init(jax.random.PRNGKey(0))
    db = build_mesh_db(cube_specs())
    B = 2
    mesh_data = gather_mesh_data(db, jnp.asarray([0, 1]), n_points_crop=8)
    images = jnp.ones((B, 3, 120, 160), jnp.float32) * 0.3
    K = make_K(B)
    TCO = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    TCO[:, 2, 3] = 0.5
    TCO = jnp.asarray(TCO)

    def loss_fn(params):
        vs = {"params": params, "batch_stats": variables["batch_stats"]}
        outs = pp.forward(
            vs, mesh_data, images, K, TCO, n_iterations=1, train=True,
            rng=jax.random.PRNGKey(1),
        )
        return jnp.sum(outs["pose_outputs"] ** 2), outs

    (loss, outs), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    # gradients reach the head and at least one backbone conv
    g_head = grads["pose_fc"]["kernel"]
    assert float(jnp.abs(g_head).sum()) > 0
    # batch stats were updated
    assert "batch_stats" in outs


def test_head_init_scale_near_identity_start():
    """head_init_scale>0 must produce a nonzero pose_fc kernel (so the
    backbone receives gradient from step 0 — the rotation-learning deadlock
    fix) while keeping the untrained output a NEAR-identity update."""
    import dataclasses

    from cosypose_tpu.models.pose_predictor import PoseNet

    cfg = dataclasses.replace(
        small_cfg(), head_init_scale=0.01, pooling="gap+moments+flatten+lk"
    )
    net = PoseNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 48, 64, 6))
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    kernel = variables["params"]["pose_fc"]["kernel"]
    assert float(jnp.abs(kernel).max()) > 0.0
    out = net.apply(variables, x, train=False)
    # near-identity: rot6d close to (1,0,0,0,1,0), v close to (0,0,1)
    ident = jnp.array([1, 0, 0, 0, 1, 0, 0, 0, 1], jnp.float32)
    dev = jnp.abs(out - ident).max()
    assert 0.0 < float(dev) < 0.5, float(dev)

    # zero scale keeps the exact-identity contract
    cfg0 = dataclasses.replace(cfg, head_init_scale=0.0)
    net0 = PoseNet(cfg0)
    v0 = net0.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out0 = net0.apply(v0, x, train=False)
    np.testing.assert_allclose(np.asarray(out0), np.tile(ident, (4, 1)), atol=1e-6)
