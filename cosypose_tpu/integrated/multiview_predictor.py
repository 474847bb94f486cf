"""Inference API for stages 2+3: multi-view scene reconstruction.

Capability match for the reference's MultiviewScenePredictor
(ref: cosypose/integrated/multiview_predictor.py:14-127): score filter →
candidate matching → view grouping → per-group bundle adjustment → reprojection
of every reconstructed object into every camera (score + 1.0, from_ba=True),
returning the same prediction dict keys:
cand_inputs, cand_matched, scene/objects, scene/cameras, ba_input, ba_output,
ba_output+all_cand.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..multiview.bundle_adjustment import MultiviewRefinement, make_view_groups
from ..multiview.ransac import multiview_candidate_matching
from ..ops.transforms import invert_T
from ..utils.logging import get_logger
from ..utils.tensor_collection import PandasTensorCollection, concatenate

logger = get_logger(__name__)


class MultiviewScenePredictor:
    def __init__(self, mesh_db_ransac, mesh_db_ba=None):
        """mesh_db_ransac: BatchedMeshes built with aabb=True (8 corner points);
        mesh_db_ba: optionally a finer point set for BA (defaults to the same —
        the reference defaults BA to AABB too, ref: multiview_predictor.py:15-18).
        """
        self.mesh_db_ransac = mesh_db_ransac
        self.mesh_db_ba = mesh_db_ba if mesh_db_ba is not None else mesh_db_ransac

    def reproject_scene(self, objects, cameras):
        """Every object into every camera (ref: multiview_predictor.py:20-41)."""
        TWC = np.asarray(cameras.TWC)
        TWO = np.asarray(objects.TWO)
        TCO_data = []
        for o in range(len(objects)):
            for v in range(len(cameras)):
                infos = dict(
                    scene_id=cameras.infos["scene_id"].values[v : v + 1],
                    view_id=cameras.infos["view_id"].values[v : v + 1],
                    score=objects.infos["score"].values[o : o + 1] + 1.0,
                    view_group=objects.infos["view_group"].values[o : o + 1],
                    label=objects.infos["label"].values[o : o + 1],
                    batch_im_id=cameras.infos["batch_im_id"].values[v : v + 1],
                    obj_id=objects.infos["obj_id"].values[o : o + 1],
                    from_ba=[True],
                )
                pose = np.asarray(
                    invert_T(jnp.asarray(TWC[v : v + 1]))
                ) @ TWO[o : o + 1]
                TCO_data.append(
                    PandasTensorCollection(
                        pd.DataFrame(infos), poses=jnp.asarray(pose)
                    )
                )
        return concatenate(TCO_data)

    def predict_scene_state(
        self,
        candidates: PandasTensorCollection,
        cameras: PandasTensorCollection,
        score_th: float = 0.3,
        use_known_camera_poses: bool = False,
        ransac_n_iter: int = 2000,
        ransac_dist_threshold: float = 0.02,
        ba_n_iter: int = 100,
    ) -> dict:
        predictions = {}
        cand_inputs = candidates

        assert candidates.infos["scene_id"].nunique() == 1
        scene_id = candidates.infos["scene_id"].iloc[0]
        group_id = candidates.infos["group_id"].iloc[0]
        keep = np.where(candidates.infos["score"] >= score_th)[0]
        candidates = candidates[keep]
        predictions["cand_inputs"] = candidates

        logger.debug(f"Num candidates: {len(candidates)}")
        logger.debug(f"Num views: {len(cameras)}")

        matching = multiview_candidate_matching(
            candidates=candidates,
            mesh_db=self.mesh_db_ransac,
            n_ransac_iter=ransac_n_iter,
            dist_threshold=ransac_dist_threshold,
            cameras=cameras if use_known_camera_poses else None,
        )
        pairs_TC1C2 = matching["pairs_TC1C2"]
        candidates = matching["filtered_candidates"]
        predictions["cand_matched"] = candidates

        group_infos = make_view_groups(pairs_TC1C2)
        candidates = candidates.merge_df(group_infos, on="view_id")

        pred_objects, pred_cameras, pred_reproj, pred_reproj_init = [], [], [], []
        for view_group, cand_ids in candidates.infos.groupby("view_group").groups.items():
            candidates_n = candidates[np.asarray(cand_ids)]
            problem = MultiviewRefinement(
                candidates=candidates_n,
                cameras=cameras,
                pairs_TC1C2=pairs_TC1C2,
                mesh_db=self.mesh_db_ba,
            )
            ba = problem.solve(
                n_iterations=ba_n_iter,
                optimize_cameras=not use_known_camera_poses,
            )
            for key, coll in (("objects", ba["objects"]), ("cameras", ba["cameras"]),
                              ("objects_init", ba["objects_init"]),
                              ("cameras_init", ba["cameras_init"])):
                coll.infos["view_group"] = view_group
                coll.infos["group_id"] = group_id
                coll.infos["scene_id"] = scene_id
            # carry batch_im_id through from the input cameras
            for coll in (ba["cameras"], ba["cameras_init"]):
                if "batch_im_id" not in coll.infos and "batch_im_id" in cameras.infos:
                    lookup = cameras.infos.set_index("view_id")["batch_im_id"]
                    coll.infos["batch_im_id"] = lookup.loc[
                        coll.infos["view_id"]
                    ].values

            pred_reproj.append(self.reproject_scene(ba["objects"], ba["cameras"]))
            pred_reproj_init.append(
                self.reproject_scene(ba["objects_init"], ba["cameras_init"])
            )
            pred_objects.append(ba["objects"])
            pred_cameras.append(ba["cameras"])

        predictions["scene/objects"] = concatenate(pred_objects)
        predictions["scene/cameras"] = concatenate(pred_cameras)
        predictions["ba_output"] = concatenate(pred_reproj)
        predictions["ba_input"] = concatenate(pred_reproj_init)

        cand_inputs = PandasTensorCollection(
            cand_inputs.infos.copy(), poses=cand_inputs.poses
        )
        cand_inputs.infos["from_ba"] = False
        predictions["ba_output+all_cand"] = concatenate(
            [predictions["ba_output"], cand_inputs]
        )
        return predictions
