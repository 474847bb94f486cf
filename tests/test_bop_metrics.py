"""Native BOP19 metrics (MSSD/MSPD/VSD + Average Recall) unit tests.

Pinned against hand-computed values from the published definitions (Hodan et
al., ECCV 2020) — the reference defers these to the external bop_toolkit
(ref: cosypose/scripts/run_bop20_eval.py:74-85), so parity here is to the
spec, not to reference code.
"""

import numpy as np
import pytest

from cosypose_tpu.evaluation.bop_metrics import (
    BopAverageRecall,
    MSPD_THRESHOLDS,
    RECALL_THRESHOLDS,
    VSD_TAUS_REL,
    _greedy_match_count,
    mspd,
    mssd,
    vsd,
)


def _pose(R=None, t=(0, 0, 0)):
    T = np.eye(4)
    if R is not None:
        T[:3, :3] = R
    T[:3, 3] = t
    return T


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], float)


IDENT_SYM = (np.eye(4)[None], np.array([True]))


class TestMSSD:
    def test_identity_is_zero(self):
        pts = np.random.RandomState(0).randn(50, 3)
        T = _pose(_rotz(0.3), (0.1, 0.2, 0.5))
        assert mssd(T, T, pts, np.ones(50, bool), *IDENT_SYM) == 0.0

    def test_pure_translation(self):
        # translation by d moves every point by exactly d
        pts = np.random.RandomState(1).randn(64, 3)
        Tg = _pose(t=(0, 0, 1.0))
        Te = _pose(t=(0.03, 0, 1.0))
        assert mssd(Te, Tg, pts, np.ones(64, bool), *IDENT_SYM) == \
            pytest.approx(0.03)

    def test_rotation_max_over_points(self):
        # 90° z-rotation of a unit x-axis point moves it by sqrt(2)
        pts = np.array([[1.0, 0, 0], [0, 0, 0]])
        Te = _pose(_rotz(np.pi / 2))
        Tg = _pose()
        assert mssd(Te, Tg, pts, np.ones(2, bool), *IDENT_SYM) == \
            pytest.approx(np.sqrt(2))

    def test_symmetry_absorbs_error(self):
        # object symmetric under 180° z-rotation: an estimate off by exactly
        # that rotation has zero MSSD once the symmetry is in the set
        pts = np.random.RandomState(2).randn(40, 3)
        Te = _pose(_rotz(np.pi))
        Tg = _pose()
        syms = np.stack([np.eye(4), _pose(_rotz(np.pi))])
        ok = np.array([True, True])
        big = mssd(Te, Tg, pts, np.ones(40, bool), *IDENT_SYM)
        assert big > 0.5
        assert mssd(Te, Tg, pts, np.ones(40, bool), syms, ok) == \
            pytest.approx(0.0, abs=1e-9)

    def test_invalid_points_ignored(self):
        pts = np.array([[100.0, 0, 0], [0.01, 0, 0]])
        valid = np.array([False, True])
        Te = _pose(_rotz(np.pi / 2))
        assert mssd(Te, _pose(), pts, valid, *IDENT_SYM) == \
            pytest.approx(0.01 * np.sqrt(2))


class TestMSPD:
    def test_pixel_shift_normalized_by_width(self):
        # K = identity-ish pinhole: f=100, c=0; point at z=1 shifted 0.1 in x
        # moves 10 px; at image width 640 the r-scale is 1
        K = np.array([[100.0, 0, 0], [0, 100.0, 0], [0, 0, 1]])
        pts = np.array([[0.0, 0, 0]])
        Tg = _pose(t=(0, 0, 1.0))
        Te = _pose(t=(0.1, 0, 1.0))
        e640 = mspd(Te, Tg, K, pts, np.ones(1, bool), *IDENT_SYM, im_w=640)
        e320 = mspd(Te, Tg, K, pts, np.ones(1, bool), *IDENT_SYM, im_w=320)
        assert e640 == pytest.approx(10.0)
        assert e320 == pytest.approx(20.0)  # r = 640/320 doubles it

    def test_symmetry_min(self):
        K = np.array([[100.0, 0, 160], [0, 100.0, 120], [0, 0, 1]])
        pts = np.random.RandomState(3).randn(30, 3) * 0.05
        Tg = _pose(t=(0, 0, 1.0))
        Te = _pose(_rotz(np.pi), t=(0, 0, 1.0))
        syms = np.stack([np.eye(4), _pose(_rotz(np.pi))])
        ok = np.array([True, True])
        assert mspd(Te, Tg, K, pts, np.ones(30, bool), syms, ok, 640) == \
            pytest.approx(0.0, abs=1e-6)


class TestVSD:
    def test_perfect_alignment_zero(self):
        d = np.zeros((8, 8), np.float32)
        d[2:6, 2:6] = 1.0
        errs = vsd(d, d, d, diameter=0.2)
        assert np.allclose(errs, 0.0)

    def test_disjoint_renders_one(self):
        d_gt = np.zeros((8, 8), np.float32)
        d_gt[0:2, 0:2] = 1.0
        d_est = np.zeros((8, 8), np.float32)
        d_est[6:8, 6:8] = 1.0
        scene = np.maximum(d_gt, d_est)
        errs = vsd(d_est, d_gt, scene, diameter=0.2)
        # no overlap: nothing matches at any tau
        assert np.allclose(errs, 1.0)

    def test_tau_controls_match(self):
        # same footprint, depth offset 0.05 m, diameter 1 m:
        # taus < 0.05 fail, taus >= 0.05 match everything
        d_gt = np.zeros((8, 8), np.float32)
        d_gt[2:6, 2:6] = 1.0
        d_est = np.where(d_gt > 0, d_gt + 0.05, 0.0).astype(np.float32)
        errs = vsd(d_est, d_gt, d_gt, diameter=1.0)
        expect = (VSD_TAUS_REL * 1.0 < 0.05 - 1e-9).astype(float)
        assert np.allclose(errs, expect)

    def test_occluded_gt_pixels_excluded(self):
        # scene surface 0.5 m in front of the GT render on half its pixels →
        # those pixels are not visible and don't count in the union
        d_gt = np.zeros((8, 8), np.float32)
        d_gt[2:6, 2:6] = 1.0
        scene = d_gt.copy()
        scene[2:6, 2:4] = 0.5       # occluder in front
        d_est = np.where(d_gt > 0, d_gt, 0.0)
        d_est[2:6, 2:4] = 0.0        # estimate also absent there
        errs = vsd(d_est, d_gt, scene, diameter=0.2)
        assert np.allclose(errs, 0.0)  # all *visible* pixels match

    def test_empty_union_is_one(self):
        z = np.zeros((4, 4), np.float32)
        assert np.allclose(vsd(z, z, z, diameter=0.2), 1.0)


class TestMatching:
    def test_top_n_rule(self):
        # two estimates, one GT → BOP19 considers only the top-1 by score;
        # the accurate-but-low-score estimate is NOT eligible
        err = np.array([[0.4], [0.01]])
        scores = [0.9, 0.5]
        assert _greedy_match_count(err, scores, theta=0.1) == 0
        assert _greedy_match_count(err, scores, theta=0.5) == 1  # 1st matches

    def test_each_gt_matched_once(self):
        err = np.array([[0.01, 0.02], [0.01, 0.5]])
        assert _greedy_match_count(err, [0.5, 0.9], theta=0.1) == 2

    def test_above_threshold_no_match(self):
        err = np.array([[0.4]])
        assert _greedy_match_count(err, [1.0], theta=0.1) == 0

    def test_ignored_gt_absorbs_estimate(self):
        # toolkit semantics: the best (top-score) estimate matches an
        # ignored low-visibility GT → it is consumed without scoring, and
        # the second estimate still matches the valid GT (top-n counts ALL
        # annotated instances, so both estimates are eligible)
        err = np.array([[0.01, 0.3], [0.3, 0.01]])  # cols: [ignored, valid]
        gt_valid = np.array([False, True])
        assert _greedy_match_count(err, [0.9, 0.5], 0.1, gt_valid) == 1
        # the ignored match itself contributes nothing
        assert _greedy_match_count(err[:1], [0.9], 0.1, gt_valid) == 0


class TestAverageRecall:
    def test_perfect_predictions_ar_one(self):
        acc = BopAverageRecall(("mssd", "mspd"))
        acc.add_group(
            {"mssd": np.zeros((1, 1)), "mspd": np.zeros((1, 1))},
            scores=[1.0], gt_valid=1,
        )
        s = acc.summary()
        assert s["AR"] == 1.0 and s["AR_mssd"] == 1.0 and s["n_gt"] == 1

    def test_half_recall(self):
        acc = BopAverageRecall(("mssd",))
        acc.add_group({"mssd": np.zeros((1, 1))}, [1.0], 1)
        acc.add_group({"mssd": np.full((1, 1), 10.0)}, [1.0], 1)
        assert acc.summary()["AR_mssd"] == pytest.approx(0.5)

    def test_mssd_threshold_sweep(self):
        # relative error 0.23·d matches θ ∈ {0.25..0.50} → 6/10 thresholds
        acc = BopAverageRecall(("mssd",))
        acc.add_group({"mssd": np.array([[0.23]])}, [1.0], 1)
        assert acc.summary()["AR_mssd"] == pytest.approx(
            float((RECALL_THRESHOLDS > 0.23).mean()))

    def test_vsd_tau_variants_averaged(self):
        # errors: 0 for the first 5 taus, 1 for the rest → recall 0.5 at
        # every θ → AR_vsd 0.5
        e = np.concatenate([np.zeros(5), np.ones(5)])[None, None]
        acc = BopAverageRecall(("vsd",))
        acc.add_group({"vsd": e}, [1.0], 1)
        assert acc.summary()["AR_vsd"] == pytest.approx(0.5)

    def test_missed_gt_counts_in_denominator(self):
        # 1 est, 2 valid GTs: est matches GT0, GT1 stays unmatched → 0.5
        acc = BopAverageRecall(("mssd",))
        acc.add_group({"mssd": np.array([[0.0, 1e6]])}, [1.0], 2)
        assert acc.summary()["AR_mssd"] == pytest.approx(0.5)

    def test_ignored_gt_not_in_denominator(self):
        # one valid GT (matched) + one ignored GT: recall 1.0, n_gt 1
        acc = BopAverageRecall(("mssd",))
        acc.add_group({"mssd": np.array([[0.0, 10.0]])}, [1.0],
                      np.array([True, False]))
        s = acc.summary()
        assert s["AR_mssd"] == 1.0 and s["n_gt"] == 1

    def test_mspd_thresholds_pixels(self):
        # 12 px error at width 640 matches θ ∈ {15..50} → 8/10
        acc = BopAverageRecall(("mspd",))
        acc.add_group({"mspd": np.array([[12.0]])}, [1.0], 1)
        assert acc.summary()["AR_mspd"] == pytest.approx(
            float((MSPD_THRESHOLDS > 12.0).mean()))


class TestVSDRenderer:
    def test_vsd_through_batch_renderer(self):
        """Full VSD path with real depth renders: a perfect estimate scores
        e_VSD 0 at every tau; a 5 cm z-shifted estimate scores > 0."""
        from cosypose_tpu.evaluation.bop_metrics import _vsd_matrix
        from cosypose_tpu.ops.mesh_db import MeshSpec, build_mesh_db
        from cosypose_tpu.rendering.scene_renderer import BatchRenderer
        import jax.numpy as jnp

        # a coarse icosphere-ish blob with real faces
        rs = np.random.RandomState(0)
        v = rs.randn(80, 3)
        v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(
            np.float32) * 0.05
        f = rs.randint(0, 80, (160, 3)).astype(np.int32)
        mesh_db = build_mesh_db([MeshSpec(label="blob", vertices=v, faces=f, mesh_units="m")],
                                resample_n_points=64)
        renderer = BatchRenderer(mesh_db, resolution=(48, 64))
        K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = (0, 0, 0.4)

        out = renderer.render(jnp.zeros((1,), jnp.int32), jnp.asarray(T[None]),
                              jnp.asarray(K[None]), resolution=(48, 64),
                              render_depth=True)
        d_scene = np.asarray(out.depth[0])
        assert (d_scene > 0).sum() > 20  # object actually rendered

        M = _vsd_matrix(renderer, 0, T[None], [T], K, d_scene, diam=0.1)
        assert M.shape == (1, 1, len(VSD_TAUS_REL))
        assert np.allclose(M[0, 0], 0.0, atol=1e-6)

        Tshift = T.copy()
        Tshift[2, 3] += 0.05
        M2 = _vsd_matrix(renderer, 0, Tshift[None], [T], K, d_scene, diam=0.1)
        assert M2[0, 0, 0] > 0.3  # tau=5%·0.1m=5mm ≪ 5cm shift


class TestEndToEnd:
    def test_compute_ar_on_synthetic_fixture(self, tmp_path):
        """compute_bop19_ar over a tiny in-memory scene: perfect predictions
        → AR 1; jittered predictions → AR strictly between 0 and 1."""
        from cosypose_tpu.evaluation.bop_metrics import compute_bop19_ar
        from cosypose_tpu.ops.mesh_db import MeshSpec, build_mesh_db
        from cosypose_tpu.utils.tensor_collection import (
            PandasTensorCollection,
        )
        import pandas as pd
        import jax.numpy as jnp

        rs = np.random.RandomState(0)
        verts = rs.randn(60, 3).astype(np.float32) * 0.04
        faces = rs.randint(0, 60, (100, 3)).astype(np.int32)
        spec = MeshSpec(label="obj1", vertices=verts, faces=faces, mesh_units="m")
        mesh_db = build_mesh_db([spec], resample_n_points=128)

        class TinyDS:
            frame_index = pd.DataFrame(
                {"scene_id": [0, 0], "view_id": [0, 1]})

            def __getitem__(self, i):
                rgb = np.zeros((48, 64, 3), np.uint8)
                T = np.eye(4)
                T[:3, 3] = (0, 0, 0.5)
                obs = dict(
                    frame_info=dict(scene_id=0, view_id=i),
                    camera=dict(
                        K=np.array([[60.0, 0, 32], [0, 60.0, 24],
                                    [0, 0, 1]]),
                        TWC=np.eye(4), resolution=(48, 64),
                    ),
                    objects=[dict(label="obj1", TWO=T, visib_fract=1.0)],
                )
                return rgb, None, obs

        ds = TinyDS()
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = (0, 0, 0.5)
        infos = pd.DataFrame(
            {"scene_id": [0, 0], "view_id": [0, 1],
             "label": ["obj1", "obj1"], "score": [1.0, 1.0]})
        perfect = PandasTensorCollection(
            infos.copy(), poses=jnp.asarray(np.stack([T, T])))
        s = compute_bop19_ar(perfect, ds, mesh_db,
                             error_types=("mssd", "mspd"))
        assert s["AR"] == 1.0 and s["n_gt"] == 2

        Tj = T.copy()
        Tj[:3, 3] += (0.012, 0, 0)   # ~15% of the ~8 cm object diameter
        jitter = PandasTensorCollection(
            infos.copy(), poses=jnp.asarray(np.stack([Tj, Tj])))
        s2 = compute_bop19_ar(jitter, ds, mesh_db,
                              error_types=("mssd", "mspd"))
        assert 0.0 < s2["AR"] < 1.0
