"""Stage 2: multi-view object-candidate matching (RANSAC over relative poses).

Capability match for the reference's ``cosypose/multiview/ransac.py``: closed-form
relative camera pose hypotheses from pairs of object-object matches with symmetry
resolution, hypothesis scoring over all tentative matches, greedy inlier
selection, and scene-level matching via strongly-connected components.

TPU-first split (SURVEY.md §7.1):
  * host (C++): tentative-match enumeration + seed sampling
    (matching_cext.make_ransac_infos) and greedy unique inlier matching
    (find_ransac_inliers) — data-dependent combinatorics;
  * device (jit): ALL distance math — symmetry-resolved camera-pose estimation
    and hypothesis×match scoring — as fixed-shape masked kernels, padded to
    power-of-two buckets to bound recompilation;
  * host (scipy/pandas): connected components + bookkeeping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import connected_components

from ..ops.transforms import invert_T, transform_pts
from ..utils.tensor_collection import PandasTensorCollection
from ..utils.timer import Timer
from ..utils.logging import get_logger
from . import matching_cext

logger = get_logger(__name__)


def _bucket(n: int, minimum: int = 256) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _sym_dist(T1, T2, points, syms, sym_valid):
    """min over T1's symmetries of mean point distance — the scoring metric
    (ref: lib3d/symmetric_distances.py:38-57, selection by mean squared dist,
    value = mean sqrt dist under the best symmetry)."""
    T1_sym = jnp.einsum("nij,nsjk->nsik", T1, syms,
                        precision=jax.lax.Precision.HIGHEST)
    p1 = transform_pts(T1_sym, points)          # (N, S, P, 3)
    p2 = transform_pts(T2, points)[:, None]     # (N, 1, P, 3)
    d2 = ((p1 - p2) ** 2).sum(-1)               # (N, S, P)
    mean_d2 = jnp.where(sym_valid, d2.mean(-1), jnp.inf)
    best = jnp.argmin(mean_d2, axis=1)
    n = jnp.arange(T1.shape[0])
    return jnp.sqrt(d2[n, best]).mean(-1), best


@functools.partial(jax.jit, static_argnames=())
def _estimate_camera_poses_kernel(
    TC1Oa, TC2Ob, TC1Og, TC2Od,
    syms_ab, sym_valid_ab,       # symmetries of the seed's first match label
    points_gd, syms_gd, sym_valid_gd,  # geometry of the second match label
):
    """Symmetry-resolved TC1C2 per seed (ref: multiview/ransac.py:19-47).

    For every symmetry S of object a, the camera hypothesis is
    TC1C2(S) = TC1Oa @ S @ TObC2; it is scored by how well it re-poses the
    second match (g, d), with g's own symmetries minimized over. The best S
    wins. All (N, Sa) hypotheses are evaluated in one fixed-shape block.
    """
    N, Sa = syms_ab.shape[:2]
    TObC2 = invert_T(TC2Ob)
    hp = jax.lax.Precision.HIGHEST
    # (N, Sa, 4, 4) camera hypotheses
    TC1C2_s = jnp.einsum("nij,nsjk,nkl->nsil", TC1Oa, syms_ab, TObC2,
                         precision=hp)
    # re-posed second-match object: T2(s) = TC1C2(s) @ TC2Od
    T2_s = jnp.einsum("nsij,njk->nsik", TC1C2_s, TC2Od, precision=hp)

    def score_one_sym(T2_col):
        d, _ = _sym_dist(TC1Og, T2_col, points_gd, syms_gd, sym_valid_gd)
        return d

    dists = jax.vmap(score_one_sym, in_axes=1, out_axes=1)(T2_s)  # (N, Sa)
    dists = jnp.where(sym_valid_ab, dists, jnp.inf)
    best = jnp.argmin(dists, axis=1)
    n = jnp.arange(N)
    return TC1C2_s[n, best]


@functools.partial(jax.jit, static_argnames=())
def _score_tmatches_kernel(TC1Oa, TC2Ob, TC1C2, points, syms, sym_valid):
    """Distance of tentative match (a,b) under camera hypothesis TC1C2
    (ref: multiview/ransac.py:67-74): symmetric distance between TC1Oa and
    TC1C2 @ TC2Ob."""
    TWOb = jnp.einsum("nij,njk->nik", TC1C2, TC2Ob,
                      precision=jax.lax.Precision.HIGHEST)
    d, _ = _sym_dist(TC1Oa, TWOb, points, syms, sym_valid)
    return d


@functools.partial(jax.jit, static_argnames=())
def _score_tmatches_gather_kernel(poses, TC1C2, points, syms, sym_valid,
                                  label_ids, c1, c2, hyp):
    """Device-side gather + scoring of one index chunk.

    The hypothesis×match cross product is huge at protocol scale (8 views /
    2000 hypotheses → 44.8M rows); gathering its per-row pose/point/symmetry
    payloads on host and shipping them to the device moves ~16 GB through
    the ~20 MB/s tunnel (measured hang in bench_multiview). Shipping only
    the three int32 index columns and gathering from the small base tables
    ON DEVICE cuts the transfer ~30x (the indices + returned distances)."""
    TC1Oa = poses[c1]
    TC2Ob = poses[c2]
    lab = label_ids[c1]
    TWOb = jnp.einsum("nij,njk->nik", TC1C2[hyp], TC2Ob,
                      precision=jax.lax.Precision.HIGHEST)
    d, _ = _sym_dist(TC1Oa, TWOb, points[lab], syms[lab], sym_valid[lab])
    return d


def _pad_rows(arr, n):
    pad = n - arr.shape[0]
    if pad == 0:
        return arr
    cfg = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, cfg, mode="edge") if arr.shape[0] else np.zeros(
        (n,) + arr.shape[1:], arr.dtype
    )


@functools.partial(jax.jit, static_argnames=())
def _estimate_camera_poses_gather_kernel(
    poses, label_ids, points, syms, sym_valid, m1c1, m1c2, m2c1, m2c2,
):
    """Device-side gather + the seed-hypothesis kernel above.

    Ships only the four int32 index columns (the host-gathered variant moved
    (N, S, 4, 4) symmetry payloads per seed through the ~20 MB/s tunnel —
    at protocol scale that is >100 MB and dominated the models stage)."""
    lab_ab = label_ids[m1c1]
    lab_gd = label_ids[m2c1]
    return _estimate_camera_poses_kernel(
        poses[m1c1], poses[m1c2], poses[m2c1], poses[m2c2],
        syms[lab_ab], sym_valid[lab_ab],
        points[lab_gd], syms[lab_gd], sym_valid[lab_gd],
    )


def estimate_camera_poses_batch(candidates, seeds, mesh_db, chunk=2048):
    """Index-shipping device scoring of all RANSAC seeds."""
    poses = jnp.asarray(np.asarray(candidates.poses))
    label_ids = jnp.asarray(np.asarray(
        mesh_db.ids_for(candidates.infos["label"].values), np.int32))
    syms = jnp.asarray(np.asarray(mesh_db.symmetries))
    sym_valid = jnp.asarray(np.asarray(mesh_db.sym_valid))
    points = jnp.asarray(np.asarray(mesh_db.points))

    n = len(seeds["match1_cand1"])
    nb = _bucket(n, chunk)
    TC1C2 = _estimate_camera_poses_gather_kernel(
        poses, label_ids, points, syms, sym_valid,
        jnp.asarray(_pad_rows(np.asarray(seeds["match1_cand1"], np.int32), nb)),
        jnp.asarray(_pad_rows(np.asarray(seeds["match1_cand2"], np.int32), nb)),
        jnp.asarray(_pad_rows(np.asarray(seeds["match2_cand1"], np.int32), nb)),
        jnp.asarray(_pad_rows(np.asarray(seeds["match2_cand2"], np.int32), nb)),
    )
    return np.asarray(TC1C2)[:n]


def score_tmatches_batch(candidates, tmatches, TC1C2, mesh_db, chunk=None):
    """Score all (hypothesis, tentative-match) rows.

    Base tables (candidate poses, hypothesis poses, per-label points +
    symmetries) go to the device ONCE; the row indices stream in fixed-size
    chunks through one compiled kernel (power-of-two padded tail). The chunk
    is sized so the gathered (chunk, S, P, 3) intermediates stay ~100 MB on
    device regardless of the symmetry/point budget."""
    poses = jnp.asarray(np.asarray(candidates.poses))
    label_ids = jnp.asarray(
        np.asarray(mesh_db.ids_for(candidates.infos["label"].values),
                   np.int32))
    syms = jnp.asarray(np.asarray(mesh_db.symmetries))
    sym_valid = jnp.asarray(np.asarray(mesh_db.sym_valid))
    points = jnp.asarray(np.asarray(mesh_db.points))
    TC1C2_dev = jnp.asarray(TC1C2)

    n = len(tmatches["cand1"])
    if chunk is None:
        S, P = syms.shape[1], points.shape[1]
        chunk = max(2 ** 15, min(2 ** 20, 2 ** 23 // max(S * P, 1)))
    c1 = np.ascontiguousarray(tmatches["cand1"], np.int32)
    c2 = np.ascontiguousarray(tmatches["cand2"], np.int32)
    hyp = np.ascontiguousarray(tmatches["hypothesis_id"], np.int32)

    out = np.empty(n, np.float32)
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        nb = _bucket(stop - start, min(chunk, 2 ** 15))
        d = _score_tmatches_gather_kernel(
            poses, TC1C2_dev, points, syms, sym_valid, label_ids,
            jnp.asarray(_pad_rows(c1[start:stop], nb)),
            jnp.asarray(_pad_rows(c2[start:stop], nb)),
            jnp.asarray(_pad_rows(hyp[start:stop], nb)),
        )
        out[start:stop] = np.asarray(d)[: stop - start]
    return out


@functools.partial(jax.jit, static_argnames=("k", "hyp_chunk"))
def _score_select_kernel(poses, label_ids, points, syms, sym_valid, TC1C2,
                         pair_hyp, pair_hyp_valid, pair_c1, pair_c2,
                         pair_t_valid, dist_threshold, k=16, hyp_chunk=128):
    """ONE dispatch for the whole hypothesis×match scoring stage.

    The flat-indexed variant ships 3 int32 columns per expanded row — at
    protocol scale (8 views / 2000 hypotheses → ~45M rows) that is ~540 MB
    through the ~20 MB/s tunnel, which *was* the measured 26-36 s scoring
    stage (results/bench-multiview-protocol.json). This kernel receives the
    COMPACT per-pair tables (hypothesis ids + tentative matches, padded to
    (Np, Hmax) / (Np, Tmax)) — a few hundred KB — expands the cross product
    on device, and returns only the top-k hypotheses per view pair with
    their (Tmax,) distance rows for the exact C++ greedy re-ranking.

    Selection proxy: n_inliers·1e6 − Σ(inlier dists) — the non-unique
    upper bound of the cext's greedy (n_inliers, Σdists) criterion; the
    exact criterion re-ranks the k survivors on host
    (ref: cosypose_cext.cpp:107-216 semantics preserved end-to-end).

    Returns (top_hyp (Np,k) global ids, top_d (Np,k,Tmax), top_valid (Np,k)).
    """
    Np, Hmax = pair_hyp.shape
    Tmax = pair_c1.shape[1]
    n_chunks = Hmax // hyp_chunk

    def one_pair(args):
        hyp, hyp_valid, c1, c2, t_valid = args
        Ta = poses[c1]                     # (Tmax, 4, 4)
        Tb = poses[c2]
        lab = label_ids[c1]
        pts, sy, sv = points[lab], syms[lab], sym_valid[lab]

        def hyp_block(h_idx):              # (hc,) local hypothesis slots
            T12 = TC1C2[hyp[h_idx]]        # (hc, 4, 4)
            TWOb = jnp.einsum("hij,tjk->htik", T12, Tb,
                              precision=jax.lax.Precision.HIGHEST)

            def d_one(TWOb_h):
                d, _ = _sym_dist(Ta, TWOb_h, pts, sy, sv)
                return d

            return jax.vmap(d_one)(TWOb)   # (hc, Tmax)

        d = jax.lax.map(
            hyp_block, jnp.arange(Hmax).reshape(n_chunks, hyp_chunk)
        ).reshape(Hmax, Tmax)
        d = jnp.where(t_valid[None, :], d, jnp.inf)
        inl = d <= dist_threshold  # cext uses <= (matching.cpp:162)
        n_in = inl.sum(-1)
        sumd = jnp.where(inl, d, 0.0).sum(-1)
        # lexicographic (n_inliers, -Σdist): Σdist < Tmax·threshold ≪ 1e6
        score = jnp.where(hyp_valid, n_in.astype(jnp.float32) * 1e6 - sumd,
                          -jnp.inf)
        top_score, top_idx = jax.lax.top_k(score, k)
        return hyp[top_idx], d[top_idx], top_score > -jnp.inf

    return jax.lax.map(
        one_pair, (pair_hyp, pair_hyp_valid, pair_c1, pair_c2, pair_t_valid)
    )


def _compact_pair_tables(seeds, tmatches):
    """Regroup the cext's flat hypothesis-expanded arrays into per-pair
    compact tables (each pair's match list appears once, under its first
    hypothesis — the expansion repeats it verbatim per hypothesis)."""
    v1 = np.asarray(seeds["view1"], np.int64)
    v2 = np.asarray(seeds["view2"], np.int64)
    pair_key = (v1 << 32) | (v2 & 0xFFFFFFFF)
    uniq, pair_of_hyp = np.unique(pair_key, return_inverse=True)
    n_pairs = len(uniq)

    # hypotheses per pair
    order = np.argsort(pair_of_hyp, kind="stable")
    counts_h = np.bincount(pair_of_hyp, minlength=n_pairs)
    Hmax = _bucket(int(counts_h.max()), 128)
    pair_hyp = np.zeros((n_pairs, Hmax), np.int32)
    pair_hyp_valid = np.zeros((n_pairs, Hmax), bool)
    col_h = np.concatenate([np.arange(c) for c in counts_h]) if len(order) else []
    pair_hyp[pair_of_hyp[order], col_h] = order.astype(np.int32)
    pair_hyp_valid[pair_of_hyp[order], col_h] = True

    # tentative matches per pair: rows whose hypothesis is the pair's first
    hyp_ids = np.asarray(tmatches["hypothesis_id"], np.int64)
    first_hyp = np.full(n_pairs, np.iinfo(np.int64).max)
    np.minimum.at(first_hyp, pair_of_hyp, np.arange(len(pair_of_hyp)))
    sel = hyp_ids == first_hyp[pair_of_hyp[hyp_ids]]
    c1_sel = np.asarray(tmatches["cand1"], np.int32)[sel]
    c2_sel = np.asarray(tmatches["cand2"], np.int32)[sel]
    pair_of_row = pair_of_hyp[hyp_ids[sel]]
    counts_t = np.bincount(pair_of_row, minlength=n_pairs)
    Tmax = _bucket(int(counts_t.max()), 64)
    pair_c1 = np.zeros((n_pairs, Tmax), np.int32)
    pair_c2 = np.zeros((n_pairs, Tmax), np.int32)
    pair_t_valid = np.zeros((n_pairs, Tmax), bool)
    ord_t = np.argsort(pair_of_row, kind="stable")
    col_t = np.concatenate([np.arange(c) for c in counts_t]) if len(ord_t) else []
    pair_c1[pair_of_row[ord_t], col_t] = c1_sel[ord_t]
    pair_c2[pair_of_row[ord_t], col_t] = c2_sel[ord_t]
    pair_t_valid[pair_of_row[ord_t], col_t] = True
    return dict(
        pair_hyp=pair_hyp, pair_hyp_valid=pair_hyp_valid,
        pair_c1=pair_c1, pair_c2=pair_c2, pair_t_valid=pair_t_valid,
    )


def score_and_select_topk(candidates, seeds, tmatches, TC1C2, mesh_db,
                          dist_threshold, k=16):
    """Device scoring + per-pair top-k hypothesis selection.

    Returns flat (hyp, cand1, cand2, dists) arrays restricted to the k best
    hypotheses per view pair, ready for the exact cext greedy inlier pass.
    """
    tables = _compact_pair_tables(seeds, tmatches)
    poses = jnp.asarray(np.asarray(candidates.poses))
    label_ids = jnp.asarray(np.asarray(
        mesh_db.ids_for(candidates.infos["label"].values), np.int32))
    k_eff = min(k, tables["pair_hyp"].shape[1])
    top_hyp, top_d, top_valid = _score_select_kernel(
        poses, label_ids,
        jnp.asarray(np.asarray(mesh_db.points)),
        jnp.asarray(np.asarray(mesh_db.symmetries)),
        jnp.asarray(np.asarray(mesh_db.sym_valid)),
        jnp.asarray(TC1C2),
        jnp.asarray(tables["pair_hyp"]),
        jnp.asarray(tables["pair_hyp_valid"]),
        jnp.asarray(tables["pair_c1"]),
        jnp.asarray(tables["pair_c2"]),
        jnp.asarray(tables["pair_t_valid"]),
        dist_threshold, k=k_eff,
    )
    top_hyp = np.asarray(top_hyp)
    top_d = np.asarray(top_d)           # (Np, k, Tmax)
    top_valid = np.asarray(top_valid)
    Np, K, Tmax = top_d.shape
    row_valid = (top_valid[:, :, None]
                 & tables["pair_t_valid"][:, None, :])   # (Np, k, Tmax)
    hyp_flat = np.broadcast_to(top_hyp[:, :, None], (Np, K, Tmax))[row_valid]
    c1_flat = np.broadcast_to(
        tables["pair_c1"][:, None, :], (Np, K, Tmax))[row_valid]
    c2_flat = np.broadcast_to(
        tables["pair_c2"][:, None, :], (Np, K, Tmax))[row_valid]
    d_flat = top_d[row_valid]
    return (hyp_flat.astype(np.int32), c1_flat.astype(np.int32),
            c2_flat.astype(np.int32), d_flat.astype(np.float32))


def scene_level_matching(candidates, inliers):
    """SCC over the inlier-match graph → physical object ids; keep components
    with ≥2 candidates (ref: multiview/ransac.py:91-116)."""
    cand1 = inliers["inlier_matches_cand1"]
    cand2 = inliers["inlier_matches_cand2"]
    n_cand = len(candidates)
    graph = csr_matrix(
        (np.ones(len(cand1), dtype=np.int64), (cand1, cand2)),
        shape=(n_cand, n_cand),
    )
    _, ids = connected_components(graph, directed=True, connection="strong")

    counts = np.bincount(ids)
    keep = counts[ids] >= 2
    cand_infos = candidates.infos.copy()
    cand_infos["component_id"] = ids
    cand_infos = cand_infos[keep].reset_index(drop=True)
    remap = {c: i for i, c in enumerate(sorted(cand_infos["component_id"].unique()))}
    cand_infos["obj_id"] = cand_infos["component_id"].map(remap)
    del cand_infos["component_id"]

    keep_rows = cand_infos["cand_id"].values
    return PandasTensorCollection(
        cand_infos, poses=jnp.asarray(np.asarray(candidates.poses)[keep_rows])
    )


def make_obj_infos(matched_candidates) -> pd.DataFrame:
    """Per-object score = Σ candidate scores (ref: multiview/ransac.py:119-125)."""
    infos = matched_candidates.infos.loc[:, ["obj_id", "score", "label"]].copy()
    gb = infos.groupby("obj_id")
    infos["n_cand"] = gb["score"].transform(len).astype(np.int64)
    infos["score"] = gb["score"].transform("sum")
    return gb.first().reset_index(drop=False)


def get_best_viewpair_pose_est(TC1C2, seeds, inliers):
    best = inliers["best_hypotheses"]
    infos = pd.DataFrame(
        dict(view1=seeds["view1"][best], view2=seeds["view2"][best])
    )
    return PandasTensorCollection(infos, TC1C2=jnp.asarray(TC1C2[best]))


def multiview_candidate_matching(
    candidates: PandasTensorCollection,
    mesh_db,
    dist_threshold: float = 0.02,
    cameras: PandasTensorCollection | None = None,
    n_ransac_iter: int = 20,
    n_min_inliers: int = 3,
    seed: int = 0,
    scoring: str = "topk",
):
    """Orchestrator (ref: multiview/ransac.py:137-199).

    candidates: PandasTensorCollection with infos[view_id, label, score] and
    poses (N, 4, 4). cameras (optional, known poses): infos[view_id], TWC.
    Returns dict(filtered_candidates, scene_infos, pairs_TC1C2, timings).
    """
    timer_models, timer_score, timer_misc = Timer(), Timer(), Timer()

    known_poses = cameras is not None
    if known_poses:
        n_ransac_iter = 1

    timer_misc.start()
    candidates.infos["cand_id"] = np.arange(len(candidates))
    label_codes = mesh_db.ids_for(candidates.infos["label"].values)
    timer_misc.pause()

    timer_models.start()
    seeds, tmatches = matching_cext.make_ransac_infos(
        np.asarray(candidates.infos["view_id"].values, np.int32),
        np.asarray(label_codes, np.int32),
        n_ransac_iter, seed,
    )
    if len(seeds["view1"]) == 0:
        raise ValueError("No tentative matches across views")

    if known_poses:
        cam_infos = cameras.infos.copy()
        cam_infos["idx"] = np.arange(len(cam_infos))
        view_map = cam_infos.set_index("view_id")
        TWC = np.asarray(cameras.TWC)
        TWC1 = TWC[view_map.loc[seeds["view1"], "idx"].values]
        TWC2 = TWC[view_map.loc[seeds["view2"], "idx"].values]
        TC1C2 = np.asarray(invert_T(jnp.asarray(TWC1)) @ jnp.asarray(TWC2))
    else:
        TC1C2 = estimate_camera_poses_batch(candidates, seeds, mesh_db)
    timer_models.pause()

    timer_score.start()
    if scoring == "topk":
        # device cross-product scoring + top-k preselection (one dispatch),
        # exact cext greedy re-ranks only the survivors — see
        # _score_select_kernel for the measured transfer-bound rationale
        hyp_f, c1_f, c2_f, d_f = score_and_select_topk(
            candidates, seeds, tmatches, TC1C2, mesh_db, dist_threshold,
        )
        inliers = matching_cext.find_ransac_inliers(
            seeds["view1"], seeds["view2"], hyp_f, c1_f, c2_f,
            d_f, dist_threshold, n_min_inliers,
        )
    else:  # "full": flat-indexed scoring of every expanded row
        dists = score_tmatches_batch(candidates, tmatches, TC1C2, mesh_db)
        inliers = matching_cext.find_ransac_inliers(
            seeds["view1"], seeds["view2"],
            tmatches["hypothesis_id"], tmatches["cand1"], tmatches["cand2"],
            dists, dist_threshold, n_min_inliers,
        )
    timer_score.pause()

    timer_misc.resume()
    pairs_TC1C2 = get_best_viewpair_pose_est(TC1C2, seeds, inliers)
    filtered_candidates = scene_level_matching(candidates, inliers)
    scene_infos = make_obj_infos(filtered_candidates)
    timer_misc.pause()

    return dict(
        filtered_candidates=filtered_candidates,
        scene_infos=scene_infos,
        pairs_TC1C2=pairs_TC1C2,
        time_models=timer_models.stop(),
        time_score=timer_score.stop(),
        time_misc=timer_misc.stop(),
    )
