import numpy as np

from cosypose_tpu.data.bop import BOPDataset
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.recording import RecordingSceneSampler, record_dataset
from cosypose_tpu.rendering import SceneRenderer
from tests.test_pose_predictor import cube_specs


def test_scene_renderer_multi_object():
    db = build_mesh_db(cube_specs())
    obj_infos = [
        dict(label="obj_000001", TWO=np.eye(4, dtype=np.float32)),
        dict(
            label="obj_000002",
            TWO=np.asarray(
                [[1, 0, 0, 0.05], [0, 1, 0, 0], [0, 0, 1, 0.2], [0, 0, 0, 1]],
                np.float32,
            ),
        ),
    ]
    K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]], np.float32)
    TWC = np.eye(4, dtype=np.float32)
    TWC[2, 3] = -0.6  # camera looking down +z at the objects
    out = SceneRenderer(db).render_scene(
        obj_infos, [dict(K=K, TWC=TWC, resolution=(120, 160))],
        render_depth=True,
    )[0]
    assert out["rgb"].shape == (120, 160, 3)
    ids = set(np.unique(out["instance_ids"]).tolist())
    assert 1 in ids  # nearer object visible
    # object 1 (nearer) occludes object 2 at the center
    assert out["instance_ids"][60, 80] == 1
    # depth at center = front face of cube 1: z = 0.6 - 0.05 = 0.55
    assert abs(out["depth"][60, 80] - 0.55) < 5e-3


def test_record_dataset_roundtrip(tmp_path):
    db = build_mesh_db(cube_specs())
    sampler = RecordingSceneSampler(
        db,
        resolution=(96, 128),
        n_objects_interval=(1, 3),
        min_visible_pixels=20,
        border_check=False,
        camera_distance_interval=(0.5, 0.9),
    )
    ds_dir = record_dataset(sampler, tmp_path / "synt", n_chunks=2,
                            n_frames_per_chunk=2)
    # ledger written, resumable
    assert (ds_dir / "chunks_recorded.txt").read_text().split() == ["0", "1"]
    # the recorded data is a valid BOP dataset our loader can read back
    ds = BOPDataset(ds_dir, split="train_synt", load_depth=True)
    assert len(ds) == 4
    rgb, mask, obs = ds[0]
    assert rgb.shape == (96, 128, 3)
    assert len(obs["objects"]) >= 1
    assert mask.max() >= 1
    o = obs["objects"][0]
    # TWO round-trips through the BOP json (world frame)
    assert np.isfinite(o["TWO"]).all()
    assert "depth" in obs["camera"]
    # re-rendering GT pose should roughly reproduce the mask footprint
    assert (mask > 0).sum() >= 20
