"""Diagnostic: is rotation misalignment visible in the rendered pixels?

Renders each solo-tier procedural object at a pose T and at T*noise(rot 30deg)
/ T*noise(trans 2cm), and compares pixel-space differences. Also computes the
loss_orn identity floor vs oracle.
"""
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from cosypose_tpu.data.procedural_objects import ProceduralObjectDataset
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.models.pose_predictor import gather_mesh_data
from cosypose_tpu.ops.render import render
from cosypose_tpu.ops.transforms import add_pose_noise, make_T
from cosypose_tpu.ops.losses import loss_CO_symmetric

ds = ProceduralObjectDataset()
mdb = build_mesh_db(ds.mesh_specs())
B = 8
label_ids = jnp.arange(8)
md = gather_mesh_data(mdb, label_ids)

# camera: object at 0.6 m, K like the recording focal
K = jnp.tile(jnp.array([[530.0, 0, 160.0], [0, 540.0, 120.0], [0, 0, 1.0]]), (B, 1, 1))
rng = np.random.RandomState(3)
Rs = []
for _ in range(B):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    Rs.append(Q)
R = jnp.asarray(np.stack(Rs), jnp.float32)
t = jnp.tile(jnp.array([0.0, 0.0, 0.6], jnp.float32), (B, 1))
TCO = make_T(R, t)

key = jax.random.PRNGKey(0)
TCO_rot = add_pose_noise(key, TCO, euler_deg_std=(15.0, 15.0, 15.0),
                         trans_std=(0.0, 0.0, 0.0))
TCO_trans = add_pose_noise(key, TCO, euler_deg_std=(0.0, 0.0, 0.0),
                           trans_std=(0.01, 0.01, 0.05))

def rend(T):
    return render(md["tri_verts"], md["tri_valid"], T, K,
                  image_size=(240, 320), colors=md["tri_colors"]).rgb

img0 = rend(TCO)
img_r = rend(TCO_rot)
img_t = rend(TCO_trans)

occ = (img0.sum(1) > 0) | (img_r.sum(1) > 0)
for i in range(B):
    m = occ[i]
    dr = jnp.abs(img_r[i] - img0[i]).mean(0)[m].mean()
    dt = jnp.abs(img_t[i] - img0[i]).mean(0)[m].mean()
    # rot error magnitude
    dR = TCO_rot[i, :3, :3] @ TCO[i, :3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    print(f"obj {i}: rot_noise={ang:5.1f}deg  pixdiff_rot={dr:.4f}  pixdiff_trans={dt:.4f}")

# loss_orn floor: identity rotation output vs oracle
pts = md["crop_points"]
gt = TCO[:, None]  # (B,1,4,4) sym set = identity only
pred_id = make_T(TCO_rot[:, :3, :3], TCO[:, :3, 3])   # identity dR: keeps noised rot
pred_or = make_T(TCO[:, :3, :3], TCO[:, :3, 3])       # oracle dR
print("loss_orn identity floor:", np.asarray(loss_CO_symmetric(gt, pred_id, pts)))
print("loss_orn oracle        :", np.asarray(loss_CO_symmetric(gt, pred_or, pts)))
