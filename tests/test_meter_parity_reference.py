"""Metric parity vs the REFERENCE's meter implementations (SURVEY §7.3 #6).

Loads the reference's numpy/pandas meter utilities directly from
/root/reference (read-only, import-by-path so the torch-heavy package
__init__ is bypassed) and pins this rebuild's metric outputs to them on
shared random fixtures:

  * compute_auc_posecnn — PoseCNN AUC (ref: evaluation/meters/utils.py:132)
  * match_poses         — greedy score-ordered matching (ref: utils.py:99)
  * AP                  — sklearn average_precision_score rescaled to n_gt
                          (ref: evaluation/meters/pose_meters.py:264-271)
  * ADD / ADD-S         — torch distance kernels (ref: lib3d/distances.py)
"""

import importlib.util
import pathlib
import sys

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from cosypose_tpu.evaluation.meters import (
    compute_ap,
    compute_auc_posecnn,
    match_poses,
    _add_errors_kernel,
    _adds_errors_kernel,
)

REF = pathlib.Path("/root/reference")


def _load_ref_module(relpath, name):
    path = REF / relpath
    if not path.exists():
        pytest.skip(f"reference not mounted: {path}")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_utils():
    return _load_ref_module("cosypose/evaluation/meters/utils.py",
                            "ref_meter_utils")


def test_auc_posecnn_matches_reference(ref_utils):
    rng = np.random.RandomState(0)
    cases = [
        rng.uniform(0, 0.2, 500),                     # mixed
        rng.uniform(0, 0.05, 64),                     # all under threshold
        np.concatenate([rng.uniform(0, 0.1, 10),      # with inf (unmatched)
                        np.full(5, np.inf)]),
        rng.uniform(0.15, 0.5, 32),                   # all over threshold
    ]
    for errors in cases:
        ours = compute_auc_posecnn(errors)
        ref = ref_utils.compute_auc_posecnn(errors)
        if np.isnan(ref):
            assert np.isnan(ours)
        else:
            assert abs(ours - float(ref)) < 1e-12, (ours, ref)


def _random_candidates(rng, n_frames=6, n_labels=3, n_pred=4, n_gt=4):
    rows = []
    for f in range(n_frames):
        for lab in range(n_labels):
            preds = rng.choice(20, size=rng.randint(0, n_pred + 1),
                               replace=False)
            gts = rng.choice(20, size=rng.randint(0, n_gt + 1), replace=False)
            scores = {p: rng.uniform(0, 1) for p in preds}
            for p in preds:
                for g in gts:
                    rows.append(
                        dict(scene_id=0, view_id=f, label=f"obj_{lab}",
                             pred_id=int(p) + 100 * f + 1000 * lab,
                             gt_id=int(g) + 100 * f + 1000 * lab,
                             score=scores[p], error=rng.uniform(0, 0.1))
                    )
    return pd.DataFrame(rows)


def test_match_poses_matches_reference(ref_utils):
    rng = np.random.RandomState(1)
    for trial in range(3):
        cand = _random_candidates(rng)
        ours = match_poses(cand.copy())
        ref = ref_utils.match_poses(cand.copy())
        key = ["pred_id", "gt_id"]
        ours_set = set(map(tuple, ours[key].values.tolist())) if len(ours) else set()
        ref_set = set(map(tuple, ref[key].values.tolist())) if len(ref) else set()
        assert ours_set == ref_set


def test_ap_matches_reference_formula():
    from sklearn.metrics import average_precision_score

    rng = np.random.RandomState(2)
    for trial in range(5):
        n = rng.randint(5, 60)
        df = pd.DataFrame(
            {
                "0.1d": rng.rand(n) < 0.5,
                # include score ties (quantized) to exercise tie handling
                "score": np.round(rng.rand(n), 1),
            }
        )
        n_gt = int(df["0.1d"].sum()) + rng.randint(0, 10)
        if df["0.1d"].sum() == 0 or n_gt == 0:
            continue
        ours = compute_ap(df, n_gt)
        ref = float(
            average_precision_score(df["0.1d"].values, df["score"].values)
            * df["0.1d"].sum() / n_gt
        )
        assert abs(ours - ref) < 1e-12


def _rand_T(rng, n):
    T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for i in range(n):
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        T[i, :3, :3] = Q
        T[i, :3, 3] = rng.uniform(-0.1, 0.1, 3)
    return T


def test_add_adds_errors_match_reference_torch():
    torch = pytest.importorskip("torch")
    # distances.py only needs transform_pts from the reference's
    # transform_ops, whose other imports (transforms3d) are absent in this
    # image — register stub parent packages with a faithful transform_pts
    # (ref: lib3d/transform_ops.py:7-24) so the real distance code runs.
    import types

    def transform_pts(T, pts):
        pts = pts.unsqueeze(-1)
        T = T.unsqueeze(-3)
        out = T[..., :3, :3] @ pts + T[..., :3, [-1]]
        return out.squeeze(-1)

    pkg = types.ModuleType("cosypose")
    lib3d = types.ModuleType("cosypose.lib3d")
    tops = types.ModuleType("cosypose.lib3d.transform_ops")
    tops.transform_pts = transform_pts
    pkg.lib3d = lib3d
    lib3d.transform_ops = tops
    sys.modules.setdefault("cosypose", pkg)
    sys.modules["cosypose.lib3d"] = lib3d
    sys.modules["cosypose.lib3d.transform_ops"] = tops

    dist = _load_ref_module("cosypose/lib3d/distances.py", "ref_distances")

    rng = np.random.RandomState(3)
    B, P = 8, 200
    T1 = _rand_T(rng, B)
    T2 = _rand_T(rng, B)
    pts = rng.uniform(-0.05, 0.05, (B, P, 3)).astype(np.float32)
    valid = np.ones((B, P), bool)

    ours_add = np.asarray(
        _add_errors_kernel(jnp.asarray(T1), jnp.asarray(T2),
                           jnp.asarray(pts), jnp.asarray(valid))["norm_avg"]
    )
    ref_add = (
        dist.dists_add(torch.tensor(T1), torch.tensor(T2), torch.tensor(pts))
        .norm(dim=-1).mean(dim=-1).numpy()
    )
    np.testing.assert_allclose(ours_add, ref_add, atol=1e-5)

    ours_adds = np.asarray(
        _adds_errors_kernel(jnp.asarray(T1), jnp.asarray(T2),
                            jnp.asarray(pts), jnp.asarray(valid))["norm_avg"]
    )
    ref_adds = (
        dist.dists_add_symmetric(
            torch.tensor(T1), torch.tensor(T2), torch.tensor(pts)
        ).norm(dim=-1).mean(dim=-1).numpy()
    )
    np.testing.assert_allclose(ours_adds, ref_adds, atol=1e-5)
