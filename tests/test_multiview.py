import numpy as np
import jax.numpy as jnp
import pandas as pd
import pytest

pytestmark = pytest.mark.slow

from cosypose_tpu.multiview import (
    multiview_candidate_matching,
    make_view_groups,
    MultiviewRefinement,
)
from cosypose_tpu.multiview import matching_cext
from cosypose_tpu.ops.mesh_db import MeshSpec, build_mesh_db
from cosypose_tpu.ops.transforms import invert_T
from cosypose_tpu.utils.tensor_collection import PandasTensorCollection


def cube_verts(s):
    return np.array(
        [[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)],
        dtype=np.float64,
    )


def cube_faces():
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    tris = []
    for a, b, c, d in quads:
        tris.append((a, b, c))
        tris.append((a, c, d))
    return np.asarray(tris)


def make_db():
    return build_mesh_db(
        [
            MeshSpec(label=f"obj_{i}", vertices=cube_verts(0.03 * (i + 1)) * 1000,
                     faces=cube_faces())
            for i in range(3)
        ],
        aabb=True,
        keep_geometry=False,
    )


def rot(axis, a):
    c, s = np.cos(a), np.sin(a)
    if axis == "z":
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def make_scene(noise=0.0, seed=0):
    """3 cameras, 3 objects (distinct labels), all visible everywhere."""
    rng = np.random.RandomState(seed)
    TWO = []
    for i in range(3):
        T = np.eye(4)
        T[:3, :3] = rot("z", 0.3 * i) @ rot("x", 0.2 * i)
        T[:3, 3] = [0.2 * i - 0.2, 0.05 * i, 0.1]
        TWO.append(T)
    TWC = []
    for v in range(3):
        T = np.eye(4)
        T[:3, :3] = rot("y", 0.4 * v - 0.4)
        T[:3, 3] = [0.3 * v - 0.3, 0.0, -1.0]
        TWC.append(T)

    rows, poses = [], []
    for v in range(3):
        for o in range(3):
            TCO = np.linalg.inv(TWC[v]) @ TWO[o]
            if noise > 0:
                dt = rng.normal(scale=noise, size=3)
                TCO = TCO.copy()
                TCO[:3, 3] += dt
            rows.append(dict(view_id=v, label=f"obj_{o}", score=0.9))
            poses.append(TCO)
    candidates = PandasTensorCollection(
        pd.DataFrame(rows), poses=jnp.asarray(np.stack(poses), jnp.float32)
    )
    return candidates, np.stack(TWO), np.stack(TWC)


def test_cext_make_ransac_infos_matches_numpy():
    view_ids = np.array([0, 0, 1, 1, 2], np.int32)
    label_ids = np.array([0, 1, 0, 1, 0], np.int32)
    seeds, tmatches = matching_cext.make_ransac_infos(view_ids, label_ids, 5, 0)
    # obj 0 seen in views 0,1,2; obj 1 in views 0,1.
    # view pairs (ordered): (0,1):2 matches, (0,2):1, (1,0):2, (1,2):1, (2,0):1, (2,1):1
    # seeds need m1 != m2 → only pairs with ≥2 tentative matches yield seeds
    assert set(zip(seeds["view1"].tolist(), seeds["view2"].tolist())) == {
        (0, 1), (1, 0)
    }
    # every seed's expanded tentative matches cover the pair's full match list
    n_per_hyp = np.bincount(tmatches["hypothesis_id"])
    assert (n_per_hyp == 2).all()


def test_cext_find_ransac_inliers_greedy():
    # 1 hypothesis, 3 tentative matches, one conflicting pair
    seeds_v1 = np.array([0], np.int32)
    seeds_v2 = np.array([1], np.int32)
    hyp = np.array([0, 0, 0], np.int32)
    c1 = np.array([0, 0, 1], np.int32)
    c2 = np.array([5, 6, 6], np.int32)
    dists = np.array([0.001, 0.0005, 0.01], np.float32)
    out = matching_cext.find_ransac_inliers(
        seeds_v1, seeds_v2, hyp, c1, c2, dists, 0.02, 1
    )
    # greedy by distance: (0,6) first, then (1,6) conflicts on c2, (0,5) conflicts on c1...
    # order: d=0.0005 (0,6) → accepted; d=0.001 (0,5): c1=0 used → rejected;
    # d=0.01 (1,6): c2=6 used → rejected.
    assert out["best_hypotheses"].tolist() == [0]
    assert out["inlier_matches_cand1"].tolist() == [0]
    assert out["inlier_matches_cand2"].tolist() == [6]


def test_multiview_matching_groups_objects():
    db = make_db()
    candidates, TWO, TWC = make_scene(noise=0.001)
    out = multiview_candidate_matching(
        candidates, db, n_ransac_iter=20, dist_threshold=0.02, n_min_inliers=2
    )
    filtered = out["filtered_candidates"]
    # all 9 candidates kept, grouped into 3 objects of 3 candidates each
    assert len(filtered) == 9
    sizes = filtered.infos.groupby("obj_id").size().values
    assert sorted(sizes.tolist()) == [3, 3, 3]
    # each group has a single label
    for _, g in filtered.infos.groupby("obj_id"):
        assert g["label"].nunique() == 1

    # recovered relative camera poses close to GT
    pairs = out["pairs_TC1C2"]
    for i in range(len(pairs)):
        v1 = int(pairs.infos["view1"].iloc[i])
        v2 = int(pairs.infos["view2"].iloc[i])
        gt = np.linalg.inv(TWC[v1]) @ TWC[v2]
        est = np.asarray(pairs.TC1C2[i])
        np.testing.assert_allclose(est, gt, atol=0.02)


def test_multiview_matching_known_cameras():
    db = make_db()
    candidates, TWO, TWC = make_scene(noise=0.001)
    cameras = PandasTensorCollection(
        pd.DataFrame(dict(view_id=[0, 1, 2])),
        TWC=jnp.asarray(TWC, jnp.float32),
        K=jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (3, 1, 1))),
    )
    out = multiview_candidate_matching(
        candidates, db, cameras=cameras, dist_threshold=0.02, n_min_inliers=2
    )
    assert len(out["filtered_candidates"]) == 9


def test_view_groups():
    pairs = PandasTensorCollection(
        pd.DataFrame(dict(view1=[0, 1, 5], view2=[1, 0, 6])),
        TC1C2=jnp.zeros((3, 4, 4)),
    )
    df = make_view_groups(pairs)
    groups = df.set_index("view_id")["view_group"]
    assert groups[0] == groups[1]
    # 5→6 is only one-directional: strong connectivity puts them in separate
    # groups, and 0↔1 in one
    assert groups[5] != groups[0]


def test_bundle_adjustment_converges():
    db = make_db()
    candidates, TWO, TWC = make_scene(noise=0.004, seed=3)
    K = np.zeros((3, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 600
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = 320, 240, 1

    match = multiview_candidate_matching(
        candidates, db, n_ransac_iter=20, dist_threshold=0.05, n_min_inliers=2
    )
    cameras = PandasTensorCollection(
        pd.DataFrame(dict(view_id=[0, 1, 2])),
        K=jnp.asarray(K),
        TWC=jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))),
    )
    refiner = MultiviewRefinement(
        match["filtered_candidates"], cameras, match["pairs_TC1C2"], db
    )
    out = refiner.solve(n_iterations=30)

    # gauge-free check: relative camera poses must match GT
    TWC_est = np.asarray(out["cameras"].TWC)
    view_ids = out["cameras"].infos["view_id"].values
    i0 = list(view_ids).index(0)
    for v in range(1, 3):
        iv = list(view_ids).index(v)
        rel_est = np.linalg.inv(TWC_est[i0]) @ TWC_est[iv]
        rel_gt = np.linalg.inv(TWC[0]) @ TWC[v]
        np.testing.assert_allclose(rel_est, rel_gt, atol=0.02)

    # object poses in camera-0 frame close to GT
    TWO_est = np.asarray(out["objects"].TWO)
    for n, row in out["objects"].infos.iterrows():
        label = row["label"]
        o = int(label.split("_")[1])
        TCO_est = np.linalg.inv(TWC_est[i0]) @ TWO_est[n]
        TCO_gt = np.linalg.inv(TWC[0]) @ TWO[o]
        np.testing.assert_allclose(TCO_est, TCO_gt, atol=0.02)


def make_scene_rich(seed=0, n_views=4, noise=0.002, outliers=3):
    """Duplicate labels + noise + outlier candidates — exercises the greedy
    uniqueness logic and per-pair hypothesis ranking."""
    rng = np.random.RandomState(seed)
    TWO = []
    labels = []
    for i in range(6):
        T = np.eye(4)
        T[:3, :3] = rot("z", 0.9 * i) @ rot("x", 0.2 + 0.35 * i)
        T[:3, 3] = [0.22 * (i % 3) - 0.2, 0.18 * (i // 3) - 0.1, 0.1]
        TWO.append(T)
        labels.append(f"obj_{i % 3}")  # duplicate instances per label
    TWC = []
    for v in range(n_views):
        T = np.eye(4)
        T[:3, :3] = rot("y", 0.35 * v - 0.5) @ rot("x", 0.1 * v)
        T[:3, 3] = [0.25 * v - 0.4, 0.05 * v, -1.1]
        TWC.append(T)
    rows, poses = [], []
    for v in range(n_views):
        for o in range(6):
            TCO = np.linalg.inv(TWC[v]) @ TWO[o]
            TCO = TCO.copy()
            TCO[:3, 3] += rng.normal(scale=noise, size=3)
            rows.append(dict(view_id=v, label=labels[o], score=0.9))
            poses.append(TCO)
    for _ in range(outliers):  # junk candidates that should not match
        T = np.eye(4)
        T[:3, :3] = rot("z", rng.uniform(0, 6))
        T[:3, 3] = rng.uniform(-1, 1, 3)
        rows.append(dict(view_id=int(rng.randint(n_views)),
                         label=f"obj_{int(rng.randint(3))}", score=0.5))
        poses.append(T)
    return PandasTensorCollection(
        pd.DataFrame(rows), poses=jnp.asarray(np.stack(poses), jnp.float32)
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_topk_scoring_matches_full_path(seed):
    """The device top-k preselection + exact cext re-rank must reproduce the
    full flat-scored path end to end (same matched objects, same best
    view-pair hypotheses)."""
    db = make_db()
    candidates = make_scene_rich(seed=seed)
    kw = dict(mesh_db=db, dist_threshold=0.02, n_ransac_iter=20,
              n_min_inliers=3, seed=seed)
    out_full = multiview_candidate_matching(
        candidates.clone() if hasattr(candidates, "clone") else candidates,
        scoring="full", **kw)
    out_topk = multiview_candidate_matching(candidates, scoring="topk", **kw)

    fi = out_full["filtered_candidates"].infos
    ti = out_topk["filtered_candidates"].infos
    assert len(fi) == len(ti)
    assert (fi["cand_id"].values == ti["cand_id"].values).all()
    assert (fi["obj_id"].values == ti["obj_id"].values).all()
    pf, pt = out_full["pairs_TC1C2"], out_topk["pairs_TC1C2"]
    assert (pf.infos["view1"].values == pt.infos["view1"].values).all()
    np.testing.assert_allclose(np.asarray(pf.TC1C2), np.asarray(pt.TC1C2),
                               atol=1e-6)
