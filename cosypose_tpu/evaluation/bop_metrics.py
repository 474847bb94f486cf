"""Native BOP19/20 pose-error metrics (MSSD, MSPD, VSD) + Average Recall.

The reference keeps these metrics OUTSIDE the framework: it exports a CSV and
subprocesses the official bop_toolkit (ref: cosypose/scripts/run_bop20_eval.py
:74-85), so a user without the toolkit cannot score predictions at all. This
module implements the three BOP19 pose errors and the challenge's Average
Recall protocol natively, from the published definitions (Hodan et al., "BOP
Challenge 2020", ECCV 2020 — e_MSSD/e_MSPD/e_VSD and the recall thresholds),
so `run_bop_eval` works self-contained; the CSV boundary to the official
toolkit remains for challenge submissions.

Definitions implemented (S = object symmetry set, x = model points):
  e_MSSD = min_S max_x || T̂ x − T_gt S x ||            (meters)
  e_MSPD = min_S max_x || proj(T̂ x) − proj(T_gt S x) || (pixels, scaled by
           r = 640/w so thresholds are resolution-independent)
  e_VSD  = 1 − |matched visible px| / |union visible px|, computed from depth
           renders of the estimate and GT against the scene depth with
           occlusion-aware visibility masks (tolerance δ = 15 mm),
           misalignment tolerance τ ∈ {5%..50%} of the object diameter.

Recall thresholds (BOP19):
  MSSD: θ ∈ {0.05..0.50}·diameter   MSPD: θ ∈ {5r..50r} px
  VSD:  θ ∈ {0.05..0.50} × τ ∈ {5%..50%}·diameter (100 combinations)
AR_x = mean recall over its thresholds; AR = mean(AR_VSD, AR_MSSD, AR_MSPD).

Matching follows the toolkit protocol (eval_calc_scores.py, n_top=-1):
estimates are ranked by score and the top n (n = #annotated GT instances of
the label, including low-visibility ones) greedily match the lowest-error
unmatched GT below threshold; GT with visib_fract < 0.1 are ignored — an
estimate matched to one is dropped (neither TP nor top-n survivor) and the
recall denominator counts valid GT only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..utils.logging import get_logger

logger = get_logger(__name__)

VSD_DELTA = 0.015           # visibility tolerance δ, meters
VSD_TAUS_REL = np.arange(0.05, 0.51, 0.05)        # τ / diameter
RECALL_THRESHOLDS = np.arange(0.05, 0.51, 0.05)   # θ (VSD, MSSD·diam)
MSPD_THRESHOLDS = np.arange(5.0, 51.0, 5.0)       # θ·r pixels
VISIB_GT_MIN = 0.1


# ---------------------------------------------------------------------------
# per-pair errors
# ---------------------------------------------------------------------------

def mssd(T_est, T_gt, pts, valid, syms, sym_valid):
    """e_MSSD for one (estimate, GT) pair.

    pts (P,3) model points with validity mask valid (P,); syms (S,4,4) with
    validity sym_valid (S,). Returns meters."""
    pts = np.asarray(pts, np.float64)[np.asarray(valid, bool)]
    est_pts = pts @ T_est[:3, :3].T + T_est[:3, 3]
    out = np.inf
    for S, ok in zip(np.asarray(syms, np.float64), np.asarray(sym_valid)):
        if not ok:
            continue
        gt_pts = pts @ (T_gt[:3, :3] @ S[:3, :3]).T + (
            T_gt[:3, :3] @ S[:3, 3] + T_gt[:3, 3])
        out = min(out, float(np.linalg.norm(est_pts - gt_pts, axis=-1).max()))
    return out


def _project(T, S, pts, K):
    p = pts @ (T[:3, :3] @ S[:3, :3]).T + (T[:3, :3] @ S[:3, 3] + T[:3, 3])
    z = np.maximum(p[:, 2], 1e-9)
    return np.stack([K[0, 0] * p[:, 0] / z + K[0, 2],
                     K[1, 1] * p[:, 1] / z + K[1, 2]], axis=-1)


def mspd(T_est, T_gt, K, pts, valid, syms, sym_valid, im_w):
    """e_MSPD for one pair, in r-normalized pixels (r = 640/w)."""
    pts = np.asarray(pts, np.float64)[np.asarray(valid, bool)]
    K = np.asarray(K, np.float64)
    I4 = np.eye(4)
    est_uv = _project(np.asarray(T_est, np.float64), I4, pts, K)
    out = np.inf
    for S, ok in zip(np.asarray(syms, np.float64), np.asarray(sym_valid)):
        if not ok:
            continue
        gt_uv = _project(np.asarray(T_gt, np.float64), S, pts, K)
        out = min(out, float(np.linalg.norm(est_uv - gt_uv, axis=-1).max()))
    return out * (640.0 / float(im_w))


def _visib_mask(d_scene, d_render, delta):
    """BOP19 visibility: rendered pixels that are in front of (or within δ of)
    the scene surface, or where the scene depth is invalid."""
    rendered = d_render > 0
    return rendered & ((d_render - d_scene <= delta) | (d_scene <= 0))


def vsd(d_est, d_gt, d_scene, diameter, taus_rel=VSD_TAUS_REL,
        delta=VSD_DELTA):
    """e_VSD for one pair, one value per τ. Depth maps in meters, 0=invalid.

    The estimate's visibility additionally includes its pixels that fall
    inside the GT's visible region (so an estimate hidden exactly where the
    GT is visible is still scored against it)."""
    d_est = np.asarray(d_est, np.float32)
    d_gt = np.asarray(d_gt, np.float32)
    d_scene = np.asarray(d_scene, np.float32)
    visib_gt = _visib_mask(d_scene, d_gt, delta)
    visib_est = _visib_mask(d_scene, d_est, delta) | ((d_est > 0) & visib_gt)
    union = visib_gt | visib_est
    n_union = int(union.sum())
    if n_union == 0:
        return np.ones(len(taus_rel))
    inter = visib_gt & visib_est
    diff = np.abs(d_gt - d_est)[inter]
    errs = np.empty(len(taus_rel))
    for i, tr in enumerate(taus_rel):
        matched = int((diff <= tr * diameter).sum())
        errs[i] = 1.0 - matched / n_union
    return errs


# ---------------------------------------------------------------------------
# matching + Average Recall
# ---------------------------------------------------------------------------

def _greedy_match_count(err_matrix, scores, theta, gt_valid=None):
    """Toolkit matching (eval_calc_scores.py semantics): the top-n estimates
    by score are considered, where n counts ALL annotated GT instances of the
    label — including low-visibility ones the recall ignores — and each
    estimate greedily takes the lowest-error unmatched GT with error < θ.
    A match to an ignored GT consumes the estimate but does not count; only
    matches to valid (visib ≥ 0.1) GT are returned."""
    n_est, n_gt = err_matrix.shape
    if gt_valid is None:
        gt_valid = np.ones(n_gt, bool)
    order = np.argsort(-np.asarray(scores))[:n_gt]
    taken = np.zeros(n_gt, bool)
    n = 0
    for ei in order:
        cand = np.where(~taken & (err_matrix[ei] < theta))[0]
        if len(cand):
            gi = cand[np.argmin(err_matrix[ei, cand])]
            taken[gi] = True
            n += int(gt_valid[gi])
    return n


class BopAverageRecall:
    """Accumulates per-image error matrices and computes BOP19 AR.

    add(...) once per (image, label) group; summary() returns
    {AR, AR_vsd, AR_mssd, AR_mspd, recalls per metric}."""

    def __init__(self, error_types=("vsd", "mssd", "mspd")):
        self.error_types = tuple(error_types)
        # list of (err_tensor (n_est,n_gt,n_variant), scores, diam) per type
        self.groups = {t: [] for t in self.error_types}
        self.n_gt = 0

    def add_group(self, errors: dict, scores, gt_valid):
        """errors[type] = (n_est, n_gt[, n_tau]) error array for one image's
        estimates of one object label vs ALL its annotated GTs.

        gt_valid: bool mask over the GT columns (True = visib ≥ 0.1, counts
        toward recall; False = ignored — can absorb an estimate but scores
        nothing), or an int n meaning the first n columns are all valid."""
        if np.isscalar(gt_valid):
            gt_valid = np.ones(int(gt_valid), bool)
        gt_valid = np.asarray(gt_valid, bool)
        self.n_gt += int(gt_valid.sum())
        for t in self.error_types:
            e = np.asarray(errors[t], np.float64)
            if e.ndim == 2:
                e = e[..., None]
            # a mask whose length differs from the GT dimension would
            # silently skew n_gt and per-column validity downstream
            assert e.shape[1] == gt_valid.shape[0], (
                f"{t}: error matrix has {e.shape[1]} GT columns but gt_valid "
                f"has {gt_valid.shape[0]}"
            )
            self.groups[t].append(
                (e, np.asarray(scores, np.float64), gt_valid))

    def summary(self):
        out = {}
        ars = []
        for t in self.error_types:
            if t == "vsd":
                thresholds = RECALL_THRESHOLDS
                n_var = len(VSD_TAUS_REL)
            elif t == "mssd":
                thresholds = RECALL_THRESHOLDS   # ·diameter, already divided
                n_var = 1
            else:
                thresholds = MSPD_THRESHOLDS
                n_var = 1
            recalls = np.zeros((n_var, len(thresholds)))
            for vi in range(n_var):
                for ti, th in enumerate(thresholds):
                    matched = sum(
                        _greedy_match_count(e[:, :, min(vi, e.shape[2] - 1)],
                                            s, th, gv)
                        for e, s, gv in self.groups[t]
                    )
                    recalls[vi, ti] = matched / max(self.n_gt, 1)
            ar = float(recalls.mean())
            out[f"AR_{t}"] = ar
            out[f"recalls_{t}"] = recalls.squeeze().tolist()
            ars.append(ar)
        out["AR"] = float(np.mean(ars))
        out["n_gt"] = self.n_gt
        return out


def _diameter_from_points(pts, valid):
    pts = np.asarray(pts, np.float64)[np.asarray(valid, bool)]
    # exact max pairwise distance on the (≤ a few thousand) sampled points
    if len(pts) > 1500:
        idx = np.linspace(0, len(pts) - 1, 1500).astype(int)
        pts = pts[idx]
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    return float(np.sqrt(d2.max()))


def compute_bop19_ar(preds, scene_ds, mesh_db, renderer=None,
                     error_types=("vsd", "mssd", "mspd"), n_frames=None,
                     visib_gt_min=VISIB_GT_MIN):
    """BOP19 Average Recall of predictions against a scene dataset's GT.

    preds: PandasTensorCollection with infos[scene_id, view_id, label, score]
    and poses (N,4,4). VSD requires `renderer` (BatchRenderer over the same
    mesh_db) and per-frame scene depth (`camera.depth` — recorded sets store
    it; pass load_depth=True / use the _all.png fast path). When depth or a
    renderer is missing, VSD is dropped from the AR mean with a warning.
    """
    error_types = list(error_types)
    if "vsd" in error_types and renderer is None:
        logger.warning("VSD skipped: no renderer provided")
        error_types.remove("vsd")

    diam_cache, label_ids_cache = {}, {}

    def obj_geom(label):
        if label not in diam_cache:
            lid = int(mesh_db.ids_for(np.asarray([label]))[0])
            label_ids_cache[label] = lid
            pts = np.asarray(mesh_db.points[lid])
            valid = np.asarray(mesh_db.valid[lid])
            info = mesh_db.infos.get(label, {}) if hasattr(mesh_db, "infos") \
                else {}
            diam = info.get("diameter_m") or _diameter_from_points(pts, valid)
            syms = np.asarray(mesh_db.symmetries[lid])
            sym_valid = np.asarray(mesh_db.sym_valid[lid])
            diam_cache[label] = (lid, pts, valid, syms, sym_valid, diam)
        return diam_cache[label]

    acc = BopAverageRecall(error_types)
    # positional alignment: infos row k ↔ poses[k]
    pred_infos = preds.infos.reset_index(drop=True)
    pred_poses = np.asarray(preds.poses)

    n = len(scene_ds.frame_index) if n_frames is None else min(
        n_frames, len(scene_ds.frame_index))
    vsd_on = "vsd" in error_types
    missing_depth = 0
    for i in range(n):
        rgb, _, obs = scene_ds[i]
        frame = obs["frame_info"]
        K = np.asarray(obs["camera"]["K"], np.float64)
        im_w = rgb.shape[1]
        d_scene = obs["camera"].get("depth")
        TCW = np.linalg.inv(np.asarray(obs["camera"]["TWC"], np.float64))

        # ALL annotated GT rows by label; low-visibility ones are kept as
        # ignored columns (they absorb estimates, score nothing) — toolkit
        # eval_calc_scores.py semantics with n_top=-1
        gt_by_label, gt_valid_by_label = {}, {}
        for o in obs["objects"]:
            TCO = TCW @ np.asarray(o["TWO"], np.float64)
            gt_by_label.setdefault(o["label"], []).append(TCO)
            gt_valid_by_label.setdefault(o["label"], []).append(
                float(o.get("visib_fract", 1.0)) >= visib_gt_min)

        sel = pred_infos[(pred_infos["scene_id"] == frame["scene_id"])
                         & (pred_infos["view_id"] == frame["view_id"])]
        for label, gts in gt_by_label.items():
            gt_valid = np.asarray(gt_valid_by_label[label], bool)
            rows = sel[sel["label"] == label]
            scores = rows["score"].values if len(rows) else np.zeros(0)
            # top-n by score (n = #annotated instances), toolkit protocol
            if len(rows) > len(gts):
                keep = np.argsort(-scores)[:len(gts)]
                rows = rows.iloc[keep]
                scores = scores[keep]
            ests = pred_poses[rows.index.values] if len(rows) else \
                np.zeros((0, 4, 4))
            lid, pts, valid, syms, sym_valid, diam = obj_geom(label)

            errors = {}
            if "mssd" in error_types:
                errors["mssd"] = np.array(
                    [[mssd(Te, Tg, pts, valid, syms, sym_valid) / diam
                      for Tg in gts] for Te in ests]
                ).reshape(len(ests), len(gts))
            if "mspd" in error_types:
                errors["mspd"] = np.array(
                    [[mspd(Te, Tg, K, pts, valid, syms, sym_valid, im_w)
                      for Tg in gts] for Te in ests]
                ).reshape(len(ests), len(gts))
            if vsd_on:
                if d_scene is None:
                    missing_depth += 1
                    errors["vsd"] = np.ones(
                        (len(ests), len(gts), len(VSD_TAUS_REL)))
                else:
                    errors["vsd"] = _vsd_matrix(
                        renderer, lid, ests, gts, K, d_scene, diam)
            acc.add_group(errors, scores, gt_valid)

    if missing_depth:
        logger.warning(f"VSD: {missing_depth} groups had no scene depth "
                       "(scored as errors=1)")
    return acc.summary()


def _vsd_matrix(renderer, label_id, ests, gts, K, d_scene, diam):
    """Render est+GT depth maps in one batch, then pairwise e_VSD."""
    h, w = d_scene.shape[:2]
    poses = np.concatenate([np.asarray(ests, np.float32).reshape(-1, 4, 4),
                            np.asarray(gts, np.float32).reshape(-1, 4, 4)])
    if len(poses) == 0:
        return np.ones((0, 0, len(VSD_TAUS_REL)))
    import jax.numpy as jnp
    n = len(poses)
    # pad the pose batch to a power-of-two bucket: per-(image,label) counts
    # vary 1..n and every distinct count would otherwise trigger a fresh XLA
    # compile (~minutes through the tunneled backend)
    bucket = 1 << (n - 1).bit_length()
    if bucket > n:
        pad = np.tile(np.eye(4, dtype=np.float32)[None], (bucket - n, 1, 1))
        pad[:, 2, 3] = -1.0  # behind the camera: renders empty
        poses = np.concatenate([poses, pad])
    lids = jnp.full((len(poses),), label_id, jnp.int32)
    out = renderer.render(lids, jnp.asarray(poses),
                          jnp.tile(jnp.asarray(K, jnp.float32)[None],
                                   (len(poses), 1, 1)),
                          resolution=(h, w), render_depth=True)
    depths = np.asarray(out.depth)[:n]
    d_ests, d_gts = depths[:len(ests)], depths[len(ests):]
    M = np.empty((len(ests), len(gts), len(VSD_TAUS_REL)))
    for a in range(len(ests)):
        for b in range(len(gts)):
            M[a, b] = vsd(d_ests[a], d_gts[b], d_scene, diam)
    return M
