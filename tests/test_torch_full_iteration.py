"""FULL-ITERATION numerical parity vs the reference's torch PosePredictor.

Extends test_torch_compat.py beyond the backbone: one/two complete
render-and-compare iterations — point projection, DeepIM crop box, roi_align
crop extraction, cropped intrinsics, backbone+head forward on shared
converted weights, and the image-space pose update — compared end to end
against the reference's ``cosypose/models/pose.py:89-132`` running in torch
on CPU. This pins the crop/K_crop/update semantics that real-BOP checkpoint
parity depends on (VERDICT r4 missing #4) without needing datasets.

The renderer is stubbed IDENTICALLY on both sides (a deterministic function
of TCO and K_crop), so any divergence in crop geometry changes the network
input and fails the comparison. torchvision is not installed here; its
roi_align (aligned=False, the reference's call) is reimplemented in torch
below and cross-checked against this repo's jax roi_align (whose own
semantics are oracle-tested in test_roi_align.py).
"""

import pathlib
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from cosypose_tpu.models import pose_predictor as pp_mod
from cosypose_tpu.models import PosePredictor, PosePredictorConfig
from cosypose_tpu.models.pose_predictor import gather_mesh_data
from cosypose_tpu.ops.mesh_db import MeshSpec, build_mesh_db
from cosypose_tpu.utils.torch_compat import convert_pose_checkpoint

REF = pathlib.Path("/root/reference")
RENDER_SIZE = (96, 128)


# --------------------------------------------------------------------------
# torchvision.ops.roi_align reimplementation (aligned=False, spatial_scale=1)
# --------------------------------------------------------------------------
def _tv_bilinear(img, yy, xx):
    import torch

    C, H, W = img.shape
    out_of = (yy < -1.0) | (yy > H) | (xx < -1.0) | (xx > W)
    y = yy.clamp(min=0.0)
    x = xx.clamp(min=0.0)
    y0 = y.floor().long().clamp(max=H - 1)
    x0 = x.floor().long().clamp(max=W - 1)
    y = torch.where(y0 >= H - 1, y0.to(y.dtype), y)
    x = torch.where(x0 >= W - 1, x0.to(x.dtype), x)
    y1 = (y0 + 1).clamp(max=H - 1)
    x1 = (x0 + 1).clamp(max=W - 1)
    ly, lx = y - y0.to(y.dtype), x - x0.to(x.dtype)
    hy, hx = 1.0 - ly, 1.0 - lx
    val = (img[:, y0, x0] * hy * hx + img[:, y0, x1] * hy * lx
           + img[:, y1, x0] * ly * hx + img[:, y1, x1] * ly * lx)
    return torch.where(out_of[None], torch.zeros((), dtype=img.dtype), val)


def _tv_roi_align(images, boxes, output_size, sampling_ratio=4,
                  spatial_scale=1.0, aligned=False):
    import torch

    assert not aligned
    oh, ow = output_size
    s = sampling_ratio
    outs = []
    for n in range(boxes.shape[0]):
        b = int(boxes[n, 0].item())
        x1, y1, x2, y2 = (boxes[n, 1:] * spatial_scale).tolist()
        roi_w, roi_h = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        bin_w, bin_h = roi_w / ow, roi_h / oh
        ys = (y1 + torch.arange(oh, dtype=torch.float64)[:, None] * bin_h
              + (torch.arange(s, dtype=torch.float64)[None, :] + 0.5)
              * bin_h / s).reshape(-1)
        xs = (x1 + torch.arange(ow, dtype=torch.float64)[:, None] * bin_w
              + (torch.arange(s, dtype=torch.float64)[None, :] + 0.5)
              * bin_w / s).reshape(-1)
        yy = ys[:, None].expand(oh * s, ow * s).float()
        xx = xs[None, :].expand(oh * s, ow * s).float()
        v = _tv_bilinear(images[b], yy, xx)  # (C, oh*s, ow*s)
        outs.append(v.reshape(-1, oh, s, ow, s).mean(dim=(2, 4)))
    return torch.stack(outs)


# --------------------------------------------------------------------------
# shared deterministic pseudo-render: a function of (TCO, K) only
# --------------------------------------------------------------------------
def _pseudo_render_np(TCO, K, h, w):
    t = np.asarray(TCO)[:, :3, 3]
    f = np.asarray(K)[:, 0, 0]
    yy = np.linspace(0.0, 1.0, h)[:, None]
    xx = np.linspace(0.0, 1.0, w)[None, :]
    base = yy * 3.0 + xx * 5.0  # (h, w)
    chans = []
    for c, kc in enumerate((7.0, 11.0, 13.0)):
        phase = (40.0 * t[:, 0] + 60.0 * t[:, 1] + 80.0 * t[:, 2]
                 + f / 500.0)[:, None, None]
        chans.append(0.5 + 0.5 * np.sin(base[None] * kc + phase))
    return np.stack(chans, axis=1).astype(np.float32)  # (B, 3, h, w)


class _StubRefRenderer:
    def render(self, obj_infos, TCO, K, resolution):
        import torch

        r = _pseudo_render_np(TCO.detach().numpy(), K.detach().numpy(),
                              *resolution)
        return torch.as_tensor(r)


def _stub_jax_render(tri_verts, tri_valid, TCO_input, K_crop, image_size,
                     **kw):
    out = jax.pure_callback(
        lambda T, K: _pseudo_render_np(T, K, *image_size),
        jax.ShapeDtypeStruct((TCO_input.shape[0], 3) + tuple(image_size),
                             jnp.float32),
        TCO_input, K_crop,
    )
    return types.SimpleNamespace(rgb=out)


# --------------------------------------------------------------------------
# reference loading (stubs shared with scripts/bench_multiview_ref.py)
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref_pose():
    torch = pytest.importorskip("torch")
    if not REF.exists():
        pytest.skip("reference not mounted")
    sys.path.insert(0, str(REF))
    from cosypose_tpu.scripts.bench_multiview_ref import _install_shims

    _install_shims()
    cfg_mod = types.ModuleType("cosypose.config")
    cfg_mod.DEBUG_DATA_DIR = pathlib.Path("/tmp")
    sys.modules["cosypose.config"] = cfg_mod
    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.roi_align = _tv_roi_align
    tv.ops = tv_ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv_ops

    from cosypose.models.pose import PosePredictor as RefPosePredictor
    from cosypose.models.efficientnet import EfficientNet as TorchEffNet
    import cosypose.lib3d.rigid_mesh_database as ref_meshdb

    return RefPosePredictor, TorchEffNet, ref_meshdb, torch


def _make_object(n_verts=2048, seed=3):
    rng = np.random.RandomState(seed)
    v = rng.normal(size=(n_verts, 3))
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    v = v * (40.0 + 10.0 * np.sin(v[:, :1] * 4))  # bumpy sphere, mm
    faces = np.array([[0, 1, 2], [2, 3, 4]])
    return v, faces


def test_roi_align_stub_matches_ours():
    """Guard: the torch roi_align stand-in == this repo's jax roi_align."""
    import torch

    from cosypose_tpu.ops import roi_align

    rng = np.random.RandomState(0)
    img = rng.uniform(size=(2, 3, 48, 64)).astype(np.float32)
    boxes = np.array(
        [[5.5, 3.2, 40.0, 30.7], [-4.0, 10.0, 70.0, 52.0]], np.float32)
    ours = roi_align(jnp.asarray(img), jnp.asarray(boxes),
                     output_size=(24, 32), sampling_ratio=4)
    tvb = torch.cat([torch.arange(2)[:, None].float(),
                     torch.as_tensor(boxes)], dim=1)
    stub = _tv_roi_align(torch.as_tensor(img), tvb, (24, 32),
                         sampling_ratio=4).numpy()
    np.testing.assert_allclose(np.asarray(ours), stub, atol=1e-4)


def test_full_iteration_parity(ref_pose, monkeypatch):
    RefPosePredictor, TorchEffNet, ref_meshdb, torch = ref_pose

    verts_mm, faces = _make_object()
    mesh_db = build_mesh_db(
        [MeshSpec(label="obj", vertices=verts_mm, faces=faces)], n_sym=1)

    # reference mesh db over the same (meter) points
    pts_m = torch.as_tensor(verts_mm[None] * 0.001, dtype=torch.float32)
    sym = torch.eye(4)[None, None]
    ref_db = ref_meshdb.BatchedMeshes({"obj": dict(n_sym=1)}, ["obj"],
                                      pts_m, sym)

    torch.manual_seed(0)
    backbone = TorchEffNet.from_name("efficientnet-b3", in_channels=6)
    backbone.n_features = 1536  # ref: training/pose_models_cfg.py:24
    ref_model = RefPosePredictor(backbone, _StubRefRenderer(), ref_db,
                                 render_size=RENDER_SIZE).eval()

    # shared inputs
    B = 2
    rng = np.random.RandomState(1)
    images = rng.uniform(size=(B, 3, 192, 256)).astype(np.float32)
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 320.0
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = 128, 96, 1
    TCO = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    TCO[:, :3, 3] = [[0.02, -0.01, 0.45], [-0.03, 0.015, 0.6]]
    TCO[0, :3, :3] = np.array(
        [[0.936, -0.275, 0.218], [0.289, 0.957, -0.034],
         [-0.199, 0.095, 0.975]], np.float32)

    with torch.no_grad():
        ref_out = ref_model(torch.as_tensor(images), torch.as_tensor(K),
                            ["obj"] * B, torch.as_tensor(TCO),
                            n_iterations=2)

    # ours on the converted weights, renderer stubbed to the shared function
    sd = {f"backbone.{k}": v for k, v in backbone.state_dict().items()}
    sd["pose_fc.weight"] = ref_model.pose_fc.weight.detach()
    sd["pose_fc.bias"] = ref_model.pose_fc.bias.detach()
    variables = convert_pose_checkpoint(sd)
    variables = jax.tree.map(jnp.asarray, variables)

    monkeypatch.setattr(pp_mod, "render", _stub_jax_render)
    pp = PosePredictor(PosePredictorConfig(render_size=RENDER_SIZE))
    mesh_data = gather_mesh_data(mesh_db, jnp.zeros(B, jnp.int32))
    outs = pp.forward(variables, mesh_data, jnp.asarray(images),
                      jnp.asarray(K), jnp.asarray(TCO), n_iterations=2)

    for it in (1, 2):
        ref_it = ref_out[f"iteration={it}"]
        np.testing.assert_allclose(
            np.asarray(outs["boxes_crop"][it - 1]),
            ref_it["boxes_crop"].numpy(), atol=2e-2, rtol=1e-5,
            err_msg=f"crop boxes diverge at iteration {it}")
        np.testing.assert_allclose(
            np.asarray(outs["K_crop"][it - 1]), ref_it["K_crop"].numpy(),
            atol=2e-2, rtol=1e-5,
            err_msg=f"K_crop diverges at iteration {it}")
        ours_T = np.asarray(outs["TCO_output"][it - 1])
        ref_T = ref_it["TCO_output"].numpy()
        np.testing.assert_allclose(
            ours_T[:, :3, :3], ref_T[:, :3, :3], atol=1e-4,
            err_msg=f"rotation diverges at iteration {it}")
        np.testing.assert_allclose(
            ours_T[:, :3, 3], ref_T[:, :3, 3], atol=1e-4,
            err_msg=f"translation diverges at iteration {it}")
