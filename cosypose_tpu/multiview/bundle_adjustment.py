"""Stage 3: object-level bundle adjustment (Levenberg–Marquardt on TPU).

Capability match for the reference's ``cosypose/multiview/bundle_adjustment.py``:
9D (rot6d+t) parametrization of object and camera poses, symmetry-aware
alignment of candidate targets at every evaluation, clamped squared pixel
residuals (threshold 25), LM with multiplicative damping schedule (÷9 on
accept, ×11 on reject), and BFS-chained robust initialization from the view
graph.

TPU-first redesign (SURVEY.md §7.1 + §6 known bottleneck): the reference
replicates the full parameter vector once PER RESIDUAL and runs autograd over
the replicated batch (ref: bundle_adjustment.py:175-214 — "could be much
faster" per its own comment), then inverts the normal equations on CPU
(ref: :221). Here the jacobian is one ``jax.jacrev`` of the fixed-shape
residual vector (no replication), the pseudo-inverse solve stays on device,
and the accept/reject loop is a ``lax.while_loop`` — the whole optimization is
a single XLA program.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import connected_components

from ..ops.camera import project_points
from ..ops.transforms import invert_T, pose9d_to_T, T_to_pose9d, transform_pts
from ..utils.tensor_collection import PandasTensorCollection
from ..utils.timer import Timer
from .ransac import make_obj_infos


def make_view_groups(pairs_TC1C2) -> pd.DataFrame:
    """Connected components of the view graph (ref: bundle_adjustment.py:22-35)."""
    views = pairs_TC1C2.infos.loc[:, ["view1", "view2"]].values.T
    views = np.unique(views.reshape(-1))
    view_df = pd.DataFrame(dict(view_id=views, local=np.arange(len(views))))
    lookup = view_df.set_index("view_id")
    v1 = lookup.loc[pairs_TC1C2.infos["view1"], "local"].values
    v2 = lookup.loc[pairs_TC1C2.infos["view2"], "local"].values
    graph = csr_matrix(
        (np.ones(len(v1)), (v1, v2)), shape=(len(views), len(views))
    )
    _, ids = connected_components(graph, directed=True, connection="strong")
    view_df["view_group"] = ids
    return view_df.drop(columns=["local"])


class SamplerError(Exception):
    pass


class _LMState(NamedTuple):
    TWO_9d: jax.Array
    TCW_9d: jax.Array
    loss: jax.Array
    lambd: jax.Array
    n: jax.Array
    done: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("n_iterations", "optimize_cameras"),
)
def _optimize_lm(
    TWO_9d0, TCW_9d0,
    cand_TCO, cand_view_ids, cand_obj_ids,
    K, obj_points, cand_syms, cand_sym_valid,
    n_iterations: int = 50,
    residuals_threshold: float = 25.0,
    lambd0: float = 1e-3,
    L_down: float = 9.0,
    L_up: float = 11.0,
    eps: float = 1e-5,
    optimize_cameras: bool = True,
):
    """Device LM loop (ref: bundle_adjustment.py:224-278, same schedule/criteria)."""
    n_objects, n_views = TWO_9d0.shape[0], TCW_9d0.shape[0]
    n_params_TWO = n_objects * 9

    def cand_poses(TWO_9d, TCW_9d):
        TWO = pose9d_to_T(TWO_9d)
        TCW = pose9d_to_T(TCW_9d)
        return jnp.einsum(
            "cij,cjk->cik",
            TCW[cand_view_ids], TWO[cand_obj_ids],
            precision=jax.lax.Precision.HIGHEST,
        )

    K_cand = K[cand_view_ids]
    points_cand = obj_points[cand_obj_ids]  # (C, P, 3)

    def align_targets(TWO_9d, TCW_9d):
        """Symmetry-align each candidate's observed pose to the current model
        (ref: bundle_adjustment.py:164-173)."""
        TCO = cand_poses(TWO_9d, TCW_9d)
        TCO_sym = jnp.einsum(
            "cij,csjk->csik", cand_TCO, cand_syms,
            precision=jax.lax.Precision.HIGHEST,
        )  # (C, S, 4, 4)

        def reproj_d(T1_col):
            uv1 = project_points(points_cand, K_cand, T1_col)
            uv2 = project_points(points_cand, K_cand, TCO)
            return jnp.linalg.norm(uv1 - uv2, axis=-1).mean(-1)

        dists = jax.vmap(reproj_d, in_axes=1, out_axes=1)(TCO_sym)  # (C, S)
        dists = jnp.where(cand_sym_valid, dists, jnp.inf)
        best = jnp.argmin(dists, axis=1)
        c = jnp.arange(cand_TCO.shape[0])
        return dists[c, best], TCO_sym[c, best]

    def predicted_uv(flat_params):
        TWO_9d = flat_params[:n_params_TWO].reshape(n_objects, 9)
        TCW_9d = flat_params[n_params_TWO:].reshape(n_views, 9)
        TCO = cand_poses(TWO_9d, TCW_9d)
        return project_points(points_cand, K_cand, TCO).reshape(-1)  # (C*P*2,)

    def forward(TWO_9d, TCW_9d, TCO_aligned):
        flat = jnp.concatenate([TWO_9d.reshape(-1), TCW_9d.reshape(-1)])
        yhat = predicted_uv(flat)
        y = project_points(points_cand, K_cand, TCO_aligned).reshape(-1)
        errors = y - yhat
        loss = jnp.minimum(errors**2, residuals_threshold).mean()
        J = jax.jacrev(predicted_uv)(flat)  # (R, D)
        return errors, loss, J

    D = n_params_TWO + n_views * 9
    idD = jnp.eye(D, dtype=TWO_9d0.dtype)

    _, TCO_aligned0 = align_targets(TWO_9d0, TCW_9d0)
    _, loss0, _ = forward(TWO_9d0, TCW_9d0, TCO_aligned0)

    def body(state: _LMState) -> _LMState:
        # re-align targets and linearize at the current point
        _, TCO_aligned = align_targets(state.TWO_9d, state.TCW_9d)
        errors, loss, J = forward(state.TWO_9d, state.TCW_9d, TCO_aligned)

        A = J.T @ J + state.lambd * idD
        b = J.T @ errors
        h = jnp.linalg.pinv(A) @ b
        h_TWO = h[:n_params_TWO].reshape(n_objects, 9)
        h_TCW = h[n_params_TWO:].reshape(n_views, 9)
        TWO_new = state.TWO_9d + h_TWO
        TCW_new = state.TCW_9d + h_TCW if optimize_cameras else state.TCW_9d

        _, TCO_aligned_new = align_targets(TWO_new, TCW_new)
        _, next_loss, _ = forward(TWO_new, TCW_new, TCO_aligned_new)

        rho = loss - next_loss
        accept = rho > eps
        done = jnp.abs(rho) < eps
        return _LMState(
            TWO_9d=jnp.where(accept, TWO_new, state.TWO_9d),
            TCW_9d=jnp.where(accept, TCW_new, state.TCW_9d),
            loss=jnp.where(accept, next_loss, loss),
            lambd=jnp.where(
                accept,
                jnp.maximum(state.lambd / L_down, 1e-7),
                jnp.minimum(state.lambd * L_up, 1e7),
            ),
            n=state.n + 1,
            done=done,
        )

    def cond(state: _LMState):
        return (state.n < n_iterations) & ~state.done

    init = _LMState(
        TWO_9d=TWO_9d0, TCW_9d=TCW_9d0,
        loss=loss0,
        lambd=jnp.asarray(lambd0, TWO_9d0.dtype),
        n=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
    )
    final = jax.lax.while_loop(cond, body, init)
    return final.TWO_9d, final.TCW_9d, final.loss, final.n


class MultiviewRefinement:
    """Object-level scene refinement for one view group.

    (ref: bundle_adjustment.py:42-351; host: bookkeeping + BFS initialization,
    device: alignment, jacobians, LM)
    """

    def __init__(self, candidates, cameras, pairs_TC1C2, mesh_db):
        view_ids = np.unique(candidates.infos["view_id"])
        keep = np.logical_and(
            np.isin(pairs_TC1C2.infos["view1"], view_ids),
            np.isin(pairs_TC1C2.infos["view2"], view_ids),
        )
        pairs_TC1C2 = pairs_TC1C2[np.where(keep)[0]]
        cameras = cameras[np.where(np.isin(cameras.infos["view_id"], view_ids))[0]]

        self.cam_infos = cameras.infos
        self.view_to_id = {v: n for n, v in enumerate(self.cam_infos["view_id"])}
        self.K = jnp.asarray(cameras.K)
        self.n_views = len(self.cam_infos)

        self.obj_infos = make_obj_infos(candidates)
        self.obj_to_id = {o: n for n, o in enumerate(self.obj_infos["obj_id"])}
        obj_label_ids = mesh_db.ids_for(self.obj_infos["label"].values)
        self.obj_points = jnp.take(mesh_db.points, obj_label_ids, axis=0)
        self.n_objects = len(self.obj_infos)

        self.cand_TCO = jnp.asarray(candidates.poses)
        cand_label_ids = mesh_db.ids_for(candidates.infos["label"].values)
        self.cand_syms = jnp.take(mesh_db.symmetries, cand_label_ids, axis=0)
        self.cand_sym_valid = jnp.take(mesh_db.sym_valid, cand_label_ids, axis=0)
        self.cand_view_ids = np.array(
            [self.view_to_id[v] for v in candidates.infos["view_id"]]
        )
        self.cand_obj_ids = np.array(
            [self.obj_to_id[o] for o in candidates.infos["obj_id"]]
        )
        self.n_candidates = len(self.cand_view_ids)

        self.visibility = np.zeros((self.n_objects, self.n_views), dtype=bool)
        self.visibility[self.cand_obj_ids, self.cand_view_ids] = True

        self.v2v1_TC2C1 = {
            (self.view_to_id[v2], self.view_to_id[v1]): np.asarray(
                invert_T(jnp.asarray(T))
            )
            for v1, v2, T in zip(
                pairs_TC1C2.infos["view1"],
                pairs_TC1C2.infos["view2"],
                np.asarray(pairs_TC1C2.TC1C2),
            )
        }
        self.ov_TCO_cand = {
            (o, v): np.asarray(t)
            for o, v, t in zip(
                self.cand_obj_ids, self.cand_view_ids, np.asarray(self.cand_TCO)
            )
        }

    # -- initialization (host BFS, ref: bundle_adjustment.py:112-157) -------
    def sample_initial_TWO_TWC(self, seed):
        TWO = np.full((self.n_objects, 4, 4), np.nan, np.float32)
        TWC = np.full((self.n_views, 4, 4), np.nan, np.float32)

        rng = np.random.RandomState(seed)
        views_ordered = rng.permutation(self.n_views)
        objects_ordered = rng.permutation(self.n_objects)

        w = views_ordered[0]
        TWC[w] = np.eye(4)
        initialized = {int(w)}
        to_init = set(range(self.n_views)) - initialized
        for _ in range(20):
            if not to_init:
                break
            for v1 in views_ordered:
                if v1 in to_init:
                    for v2 in views_ordered:
                        if int(v2) not in initialized:
                            continue
                        key = (int(v2), int(v1))
                        if key in self.v2v1_TC2C1:
                            TWC[v1] = TWC[v2] @ self.v2v1_TC2C1[key]
                            to_init.remove(int(v1))
                            initialized.add(int(v1))
                            break
        if to_init:
            raise SamplerError("Cannot find an initialization")

        for o in objects_ordered:
            for v in views_ordered:
                if self.visibility[o, v]:
                    TWO[o] = TWC[v] @ self.ov_TCO_cand[(int(o), int(v))]
                    break
        return TWO, TWC

    def robust_initialization(self, n_init=1):
        """Score candidate initializations by mean aligned reprojection distance
        (ref: bundle_adjustment.py:280-293)."""
        best = None
        for seed in range(n_init):
            TWO, TWC = self.sample_initial_TWO_TWC(seed)
            TCW = np.asarray(invert_T(jnp.asarray(TWC)))
            TWO_9d = np.asarray(T_to_pose9d(jnp.asarray(TWO)))
            TCW_9d = np.asarray(T_to_pose9d(jnp.asarray(TCW)))
            d = float(self._mean_aligned_dist(TWO_9d, TCW_9d))
            if best is None or d < best[0]:
                best = (d, TWO_9d, TCW_9d)
        return jnp.asarray(best[1]), jnp.asarray(best[2])

    def _mean_aligned_dist(self, TWO_9d, TCW_9d):
        TWO = pose9d_to_T(jnp.asarray(TWO_9d))
        TCW = pose9d_to_T(jnp.asarray(TCW_9d))
        TCO = TCW[self.cand_view_ids] @ TWO[self.cand_obj_ids]
        K_cand = self.K[self.cand_view_ids]
        points = self.obj_points[self.cand_obj_ids]
        TCO_sym = jnp.einsum("cij,csjk->csik", self.cand_TCO, self.cand_syms)

        def reproj_d(T1_col):
            uv1 = project_points(points, K_cand, T1_col)
            uv2 = project_points(points, K_cand, TCO)
            return jnp.linalg.norm(uv1 - uv2, axis=-1).mean(-1)

        dists = jax.vmap(reproj_d, in_axes=1, out_axes=1)(TCO_sym)
        dists = jnp.where(self.cand_sym_valid, dists, jnp.inf)
        return jnp.min(dists, axis=1).mean()

    # -- solve ---------------------------------------------------------------
    def solve(self, sample_n_init=1, n_iterations=50, residuals_threshold=25.0,
              optimize_cameras=True):
        timer_init, timer_opt, timer_misc = Timer(), Timer(), Timer()

        timer_init.start()
        TWO_9d, TCW_9d = self.robust_initialization(sample_n_init)
        timer_init.pause()

        timer_opt.start()
        TWO_9d_opt, TCW_9d_opt, loss, n_iter = _optimize_lm(
            TWO_9d, TCW_9d,
            self.cand_TCO,
            jnp.asarray(self.cand_view_ids),
            jnp.asarray(self.cand_obj_ids),
            self.K, self.obj_points, self.cand_syms, self.cand_sym_valid,
            n_iterations=n_iterations,
            residuals_threshold=residuals_threshold,
            optimize_cameras=optimize_cameras,
        )
        timer_opt.pause()

        timer_misc.start()
        objects, cameras = self.make_scene_infos(TWO_9d_opt, TCW_9d_opt)
        objects_init, cameras_init = self.make_scene_infos(TWO_9d, TCW_9d)
        timer_misc.pause()

        return dict(
            objects_init=objects_init,
            cameras_init=cameras_init,
            objects=objects,
            cameras=cameras,
            final_loss=float(loss),
            n_lm_iterations=int(n_iter),
            time_init=timer_init.stop(),
            time_opt=timer_opt.stop(),
            time_misc=timer_misc.stop(),
        )

    def make_scene_infos(self, TWO_9d, TCW_9d):
        TWO = pose9d_to_T(jnp.asarray(TWO_9d))
        TCW = pose9d_to_T(jnp.asarray(TCW_9d))
        TWC = invert_T(TCW)
        objects = PandasTensorCollection(self.obj_infos.copy(), TWO=TWO)
        cameras = PandasTensorCollection(
            self.cam_infos.copy(), TWC=TWC, K=self.K
        )
        return objects, cameras
