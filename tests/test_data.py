"""Data-layer tests over a synthetic on-disk BOP dataset fixture."""

import json

import numpy as np
import pytest
from PIL import Image

from cosypose_tpu.data.bop import BOPDataset, BOPObjectDataset
from cosypose_tpu.data.pose_dataset import PoseDataset
from cosypose_tpu.data.detection_dataset import DetectionDataset
from cosypose_tpu.data.wrappers import (
    MultiViewWrapper,
    VisibilityWrapper,
    PartialSampler,
    DistributedSceneSampler,
)
from cosypose_tpu.ops.mesh_db import build_mesh_db


def write_cube_ply(path, size_mm=60.0):
    s = size_mm / 2
    verts = [(x, y, z) for x in (-s, s) for y in (-s, s) for z in (-s, s)]
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    lines = [
        "ply", "format ascii 1.0",
        f"element vertex {len(verts)}",
        "property float x", "property float y", "property float z",
        "property uchar red", "property uchar green", "property uchar blue",
        f"element face {len(quads)}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    for v in verts:
        lines.append(f"{v[0]} {v[1]} {v[2]} 200 60 60")
    for q in quads:
        lines.append(f"4 {q[0]} {q[1]} {q[2]} {q[3]}")
    path.write_text("\n".join(lines) + "\n")


def build_bop_fixture(base_path):
    root = base_path / "bop_datasets" / "cubes"
    models = root / "models"
    models.mkdir(parents=True)
    write_cube_ply(models / "obj_000001.ply", 60.0)
    write_cube_ply(models / "obj_000002.ply", 90.0)
    (models / "models_info.json").write_text(
        json.dumps(
            {
                "1": {"diameter": 103.9},
                "2": {
                    "diameter": 155.9,
                    "symmetries_continuous": [
                        {"axis": [0, 0, 1], "offset": [0, 0, 0]}
                    ],
                },
            }
        )
    )

    split = root / "test"
    scene = split / "000001"
    (scene / "rgb").mkdir(parents=True)
    (scene / "mask_visib").mkdir()
    H, W = 96, 128
    rng = np.random.RandomState(0)
    cams, gts, gt_infos = {}, {}, {}
    for view_id in range(3):
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        Image.fromarray(img).save(scene / "rgb" / f"{view_id:06d}.png")
        cams[str(view_id)] = dict(
            cam_K=[100.0, 0, 64.0, 0, 100.0, 48.0, 0, 0, 1],
            depth_scale=1.0,
        )
        gts[str(view_id)] = [
            dict(obj_id=1, cam_R_m2c=np.eye(3).flatten().tolist(),
                 cam_t_m2c=[0, 0, 500.0]),
            dict(obj_id=2, cam_R_m2c=np.eye(3).flatten().tolist(),
                 cam_t_m2c=[100.0, 0, 600.0]),
        ]
        gt_infos[str(view_id)] = [
            dict(visib_fract=0.9, bbox_visib=[50, 30, 20, 20]),
            dict(visib_fract=0.05, bbox_visib=[70, 40, 15, 15]),
        ]
        for n in range(2):
            m = np.zeros((H, W), np.uint8)
            m[30 + n * 10 : 50 + n * 10, 50 + n * 20 : 70 + n * 20] = 255
            Image.fromarray(m).save(
                scene / "mask_visib" / f"{view_id:06d}_{n:06d}.png"
            )
    (scene / "scene_camera.json").write_text(json.dumps(cams))
    (scene / "scene_gt.json").write_text(json.dumps(gts))
    (scene / "scene_gt_info.json").write_text(json.dumps(gt_infos))
    return root


@pytest.fixture(scope="module")
def bop_root(tmp_path_factory):
    return build_bop_fixture(tmp_path_factory.mktemp("bop"))


def test_object_dataset_and_mesh_db(bop_root):
    obj_ds = BOPObjectDataset(bop_root / "models")
    assert len(obj_ds) == 2
    assert obj_ds[0]["label"] == "obj_000001"
    assert abs(obj_ds[0]["diameter_m"] - 0.1039) < 1e-4
    specs = obj_ds.mesh_specs()
    db = build_mesh_db(specs)
    assert db.points.shape[0] == 2
    # meters conversion: cube 1 has 0.03 half-extent
    assert abs(float(db.points[0].max()) - 0.03) < 1e-5
    # object 2 has 64 continuous symmetries + identity padding handling
    assert db.infos["obj_000002"]["n_sym"] == 64
    assert db.infos["obj_000001"]["n_sym"] == 1
    # vertex colors made it into tri_colors
    assert abs(float(db.tri_colors[0].max()) - 200 / 255) < 1e-3


def test_bop_scene_dataset(bop_root):
    ds = BOPDataset(bop_root, split="test")
    assert len(ds) == 3
    rgb, mask, obs = ds[0]
    assert rgb.shape == (96, 128, 3)
    assert mask.max() == 2
    assert len(obs["objects"]) == 2
    o = obs["objects"][0]
    assert o["label"] == "obj_000001"
    np.testing.assert_allclose(o["TWO"][2, 3], 0.5, atol=1e-6)  # mm→m
    np.testing.assert_allclose(o["bbox"], [50, 30, 70, 50])
    assert obs["camera"]["K"][0, 0] == 100.0


def test_visibility_wrapper(bop_root):
    ds = VisibilityWrapper(BOPDataset(bop_root, split="test"), visib_fract_th=0.1)
    _, _, obs = ds[0]
    assert len(obs["objects"]) == 1  # the 0.05-visib object dropped


def test_multiview_wrapper(bop_root):
    ds = MultiViewWrapper(BOPDataset(bop_root, split="test"), n_views=2)
    assert len(ds) == 2  # 3 views → groups of 2 + 1
    group = ds[0]
    assert len(group) == 2
    assert group[0][2]["frame_info"]["group_id"] == 0


def test_pose_dataset(bop_root):
    ds = PoseDataset(
        BOPDataset(bop_root, split="test"),
        resize=(48, 64),
        apply_rgb_augmentation=True,
    )
    batch = ds.make_batch([0, 1, 2])
    assert batch.images.shape == (3, 3, 48, 64)
    assert batch.K.shape == (3, 3, 3)
    assert batch.TCO.shape == (3, 4, 4)
    # the visible object is obj_000001 at z=0.5
    assert all(l == "obj_000001" for l in batch.labels)
    np.testing.assert_allclose(batch.TCO[:, 2, 3], 0.5, atol=1e-5)
    # K was rescaled for the resize (48/96 = 0.5)
    np.testing.assert_allclose(batch.K[:, 0, 0], 50.0, atol=1e-3)


def test_detection_dataset(bop_root):
    ds = DetectionDataset(
        BOPDataset(bop_root, split="test"),
        label_to_category_id={"obj_000001": 0, "obj_000002": 1},
        resize=(48, 64),
        stride=4,
        max_objects=8,
        min_area=1.0,
    )
    item = ds[0]
    assert item["image"].shape == (3, 48, 64)
    assert item["heatmap"].shape == (12, 16, 2)
    assert item["obj_mask"].sum() >= 1
    assert item["heatmap"].max() > 0.9  # peak at an object center


def test_samplers(bop_root):
    ds = BOPDataset(bop_root, split="test")
    s = PartialSampler(ds, epoch_size=2)
    assert len(list(iter(s))) == 2
    parts = [list(DistributedSceneSampler(ds, 2, r, seed=1)) for r in range(2)]
    assert sorted(parts[0] + parts[1]) == [0, 1, 2]


def test_mesh_decimation():
    from cosypose_tpu.ops.mesh_io import decimate_mesh

    # dense UV sphere → decimate to ≤ 500 faces, geometry roughly preserved
    thetas = np.linspace(0, np.pi, 40)
    phis = np.linspace(0, 2 * np.pi, 80, endpoint=False)
    verts = np.array(
        [
            (np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t))
            for t in thetas
            for p in phis
        ]
    )
    faces = []
    for i in range(39):
        for j in range(80):
            a = i * 80 + j
            b = i * 80 + (j + 1) % 80
            c = (i + 1) * 80 + j
            d = (i + 1) * 80 + (j + 1) % 80
            faces.append((a, b, c))
            faces.append((b, d, c))
    faces = np.asarray(faces)
    nv, nf, _ = decimate_mesh(verts, faces, None, 500)
    assert nf.shape[0] <= 500
    assert nf.shape[0] > 50
    r = np.linalg.norm(nv, axis=-1)
    assert abs(r.mean() - 1.0) < 0.1  # still sphere-ish


def test_concat_scene_dataset():
    from cosypose_tpu.data.wrappers import ConcatSceneDataset

    class _Fake:
        def __init__(self, n, tag):
            self.n, self.tag = n, tag

        def __len__(self):
            return self.n

        @property
        def frame_index(self):
            import pandas as pd

            return pd.DataFrame(dict(scene_id=[self.tag] * self.n,
                                     view_id=range(self.n)))

        def __getitem__(self, i):
            if not 0 <= i < self.n:
                raise IndexError(i)
            return (self.tag, i, {})

    ds = ConcatSceneDataset([_Fake(3, "a"), _Fake(2, "b")])
    assert len(ds) == 5
    assert ds[0] == ("a", 0, {})
    assert ds[2] == ("a", 2, {})
    assert ds[3] == ("b", 0, {})
    assert ds[4] == ("b", 1, {})
    assert len(ds.frame_index) == 5
