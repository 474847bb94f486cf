import pytest

pytestmark = pytest.mark.slow
import numpy as np

from cosypose_tpu.data.bop import BOPDataset
from cosypose_tpu.data.texture_dataset import TextureDataset
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.recording import RecordingSceneSampler, record_dataset
from cosypose_tpu.recording.textures import (
    TextureSampler,
    procedural_corner_colors,
    triplanar_corner_colors,
)
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


def test_pile_placement_rests_without_penetration():
    db = build_mesh_db(cube_specs())
    sampler = RecordingSceneSampler(db, n_objects_interval=(6, 9))
    rng = np.random.RandomState(3)
    labels = [db.labels[rng.randint(len(db.labels))] for _ in range(8)]
    placed = sampler._place_pile(labels, rng)
    # all objects rest at or above their contact radius (on plane or pile)
    for p in placed:
        assert p["t"][2] >= p["r_c"] - 1e-9
    # no sphere-proxy interpenetration
    for i in range(len(placed)):
        for j in range(i + 1, len(placed)):
            d = np.linalg.norm(placed[i]["t"] - placed[j]["t"])
            assert d >= placed[i]["r_c"] + placed[j]["r_c"] - 1e-6
    # and the pile actually stacks: at least one object is elevated
    assert any(p["t"][2] > p["r_c"] + 1e-6 for p in placed)


def test_textured_pile_frame_with_cage_and_visib_fract():
    db = build_mesh_db(cube_specs())
    sampler = RecordingSceneSampler(
        db,
        resolution=(96, 128),
        n_objects_interval=(3, 5),
        min_visible_pixels=10,
        border_check=False,
        camera_distance_interval=(0.5, 0.9),
        texture_sampler=TextureSampler(p_textured=1.0),
        place_mode="pile",
        p_cage=1.0,
    )
    rgb, mask, obs = sampler.sample_frame(seed=7)
    assert rgb.shape == (96, 128, 3)
    # the cage renders as instance id 0 but colors the background: most
    # non-object pixels should be non-black
    bg = rgb[mask == 0]
    assert (bg.sum(axis=-1) > 10).mean() > 0.5
    for o in obs["objects"]:
        assert 0.0 < o["visib_fract"] <= 1.0
        ox1, oy1, ox2, oy2 = o["bbox_obj"]
        x1, y1, x2, y2 = o["bbox"]
        # amodal box contains the visible box
        assert ox1 <= x1 + 1 and oy1 <= y1 + 1 and ox2 >= x2 - 1 and oy2 >= y2 - 1


def test_procedural_and_triplanar_textures():
    rng = np.random.RandomState(0)
    tv = rng.uniform(-0.05, 0.05, size=(40, 3, 3))
    c = procedural_corner_colors(tv, rng)
    assert c.shape == (40, 3, 3) and c.min() >= 0 and c.max() <= 1
    assert c.std() > 0.01  # actually varies
    tex = rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)
    c2 = triplanar_corner_colors(tv, tex, rng)
    assert c2.shape == (40, 3, 3) and c2.min() >= 0 and c2.max() <= 1


def test_texture_dataset_roundtrip(tmp_path):
    from PIL import Image

    d = tmp_path / "textures" / "sub"
    d.mkdir(parents=True)
    for i in range(3):
        arr = (np.random.RandomState(i).uniform(0, 255, (16, 16, 3))
               .astype(np.uint8))
        Image.fromarray(arr).save(d / f"tex{i}.png")
    ds = TextureDataset(tmp_path / "textures")
    assert len(ds) == 3
    t = ds.sample(np.random.RandomState(0))
    assert t.shape == (16, 16, 3) and t.dtype == np.float32 and t.max() <= 1.0


def _make_test_sampler():
    db = build_mesh_db(cube_specs())
    return RecordingSceneSampler(
        db,
        resolution=(64, 96),
        n_objects_interval=(1, 3),
        min_visible_pixels=10,
        border_check=False,
        camera_distance_interval=(0.5, 0.9),
        amodal_stats=False,
    )


def test_record_dataset_parallel_workers(tmp_path):
    ds_dir = record_dataset(
        None, tmp_path / "synt", n_chunks=4, n_frames_per_chunk=1,
        n_workers=2, sampler_factory=_make_test_sampler,
    )
    done = sorted(int(x) for x in
                  (ds_dir / "chunks_recorded.txt").read_text().split())
    assert done == [0, 1, 2, 3]
    ds = BOPDataset(ds_dir, split="train_synt")
    assert len(ds) == 4
