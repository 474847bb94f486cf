"""Multi-view RANSAC + bundle-adjustment benchmark at protocol scale.

The reference's published multi-view protocol runs ~2000-hypothesis RANSAC
over groups of 4-8 views with tens of candidates per view
(ref: cosypose/scripts/run_custom_scenario.py:94-180,
run_cosypose_eval.py:290-299), and self-reports bundle adjustment as its
bottleneck (BASELINE.md). This script synthesizes a scene at that scale —
n_views cameras around a pile of n_objects, several noisy detection
candidates per visible object plus outliers — and times each stage of the
rebuild's pipeline separately:

  * RANSAC camera-pose hypotheses (estimate_camera_poses_batch)
  * hypothesis scoring + inlier extraction (score_tmatches_batch + cext)
  * scene-level matching bookkeeping
  * bundle adjustment (device LM while_loop) per view group

  python -m cosypose_tpu.scripts.bench_multiview [--n-views 8]
      [--n-objects 12] [--dup 4] [--ransac-iter 2000] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import pandas as pd


def _cube_specs(n_labels):
    from cosypose_tpu.ops.mesh_db import MeshSpec

    def cube_verts(s):
        return np.array(
            [[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)],
            dtype=np.float64,
        )

    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    faces = np.asarray(
        [t for a, b, c, d in quads for t in ((a, b, c), (a, c, d))]
    )
    return [
        MeshSpec(label=f"obj_{i:06d}",
                 vertices=cube_verts(0.02 + 0.008 * i) * 1000, faces=faces)
        for i in range(n_labels)
    ]


def _look_at(eye, target=(0.0, 0.0, 0.0)):
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0.0, 0.0, 1.0])
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    TWC = np.eye(4)
    TWC[:3, 0], TWC[:3, 1], TWC[:3, 2], TWC[:3, 3] = right, down, fwd, eye
    return TWC


def make_scenario(n_views, n_objects, n_labels, dup, outliers, noise_t,
                  noise_deg, seed=0):
    """Synthetic world: objects in a 0.4 m pile, cameras on a 1 m sphere,
    per-view noisy candidates for ~85% of objects plus score-decayed
    outliers. Returns (candidates, cameras) PandasTensorCollections."""
    from scipy.spatial.transform import Rotation

    from cosypose_tpu.utils.tensor_collection import PandasTensorCollection
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    labels = [f"obj_{rng.randint(n_labels):06d}" for _ in range(n_objects)]
    TWO = np.tile(np.eye(4), (n_objects, 1, 1))
    TWO[:, :3, :3] = Rotation.random(n_objects, random_state=rng).as_matrix()
    TWO[:, :3, 3] = rng.uniform(-0.2, 0.2, (n_objects, 3)) * [1, 1, 0.3]

    cam_rows, TWC_l = [], []
    for v in range(n_views):
        theta = 2 * np.pi * v / n_views + rng.uniform(-0.2, 0.2)
        phi = rng.uniform(0.6, 1.2)
        eye = 1.0 * np.array(
            [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi),
             np.cos(phi)]
        )
        TWC_l.append(_look_at(eye))
        cam_rows.append(dict(scene_id=0, view_id=v, batch_im_id=v,
                             group_id=0))
    TWC = np.stack(TWC_l)

    rows, poses = [], []
    for v in range(n_views):
        TCW = np.linalg.inv(TWC[v])
        for o in range(n_objects):
            if rng.uniform() > 0.85:
                continue
            for _ in range(dup):
                d = np.eye(4)
                d[:3, :3] = Rotation.from_euler(
                    "xyz", rng.normal(0, noise_deg, 3), degrees=True
                ).as_matrix()
                d[:3, 3] = rng.normal(0, noise_t, 3)
                poses.append(TCW @ TWO[o] @ d)
                rows.append(dict(scene_id=0, group_id=0, view_id=v,
                                 label=labels[o],
                                 score=float(rng.uniform(0.5, 1.0))))
        for _ in range(outliers):
            T = np.eye(4)
            T[:3, :3] = Rotation.random(random_state=rng).as_matrix()
            T[:3, 3] = [rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3),
                        rng.uniform(0.6, 1.4)]
            poses.append(T)
            rows.append(dict(scene_id=0, group_id=0, view_id=v,
                             label=labels[rng.randint(n_objects)],
                             score=float(rng.uniform(0.3, 0.6))))

    K = np.zeros((n_views, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 600.0
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = 320, 240, 1
    candidates = PandasTensorCollection(
        pd.DataFrame(rows), poses=jnp.asarray(np.stack(poses), jnp.float32)
    )
    cameras = PandasTensorCollection(
        pd.DataFrame(cam_rows), TWC=jnp.asarray(TWC, jnp.float32),
        K=jnp.asarray(K),
    )
    return candidates, cameras


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-views", type=int, default=8)
    parser.add_argument("--n-objects", type=int, default=12)
    parser.add_argument("--n-labels", type=int, default=6)
    parser.add_argument("--dup", type=int, default=4)
    parser.add_argument("--outliers", type=int, default=5)
    parser.add_argument("--ransac-iter", type=int, default=2000)
    parser.add_argument("--ba-iter", type=int, default=50)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--json", default=None)
    args = parser.parse_args(argv)

    import jax

    # scope the persistent cache per backend: CPU AOT entries compiled on a
    # different host can SIGILL when loaded here
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/cosypose_tpu_bench_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from cosypose_tpu.multiview import (MultiviewRefinement, make_view_groups,
                                        multiview_candidate_matching)
    from cosypose_tpu.ops.mesh_db import build_mesh_db

    mesh_db = build_mesh_db(_cube_specs(args.n_labels), aabb=True,
                            keep_geometry=False)
    candidates, cameras = make_scenario(
        args.n_views, args.n_objects, args.n_labels, args.dup, args.outliers,
        noise_t=0.004, noise_deg=2.0,
    )
    print(f"scenario: {len(candidates)} candidates over {args.n_views} views "
          f"({args.n_objects} objects, {args.ransac_iter} RANSAC hypotheses)")

    rows = []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        match = multiview_candidate_matching(
            candidates=candidates, mesh_db=mesh_db,
            n_ransac_iter=args.ransac_iter,
        )
        t_match = time.perf_counter() - t0

        filtered = match["filtered_candidates"]
        group_infos = make_view_groups(match["pairs_TC1C2"])
        merged = filtered.merge_df(group_infos, on="view_id")

        t0 = time.perf_counter()
        n_groups = 0
        n_obj = 0
        for _, cand_ids in merged.infos.groupby("view_group").groups.items():
            problem = MultiviewRefinement(
                candidates=merged[np.asarray(cand_ids)], cameras=cameras,
                pairs_TC1C2=match["pairs_TC1C2"], mesh_db=mesh_db,
            )
            ba = problem.solve(n_iterations=args.ba_iter)
            n_groups += 1
            n_obj += len(ba["objects"])
        t_ba = time.perf_counter() - t0
        def _s(v):
            return v.total_seconds() if hasattr(v, "total_seconds") else float(v)

        rows.append(dict(
            rep=rep, n_candidates=len(candidates),
            n_matched=len(filtered), n_groups=n_groups, n_objects_out=n_obj,
            ransac_models_s=_s(match["time_models"]),
            ransac_score_s=_s(match["time_score"]),
            ransac_misc_s=_s(match["time_misc"]), ransac_total_s=t_match,
            ba_total_s=t_ba,
        ))
        print(f"rep {rep}: ransac {t_match:.2f}s "
              f"(models {_s(match['time_models']):.2f} score "
              f"{_s(match['time_score']):.2f} misc {_s(match['time_misc']):.2f}) "
              f"ba {t_ba:.2f}s over {n_groups} group(s), "
              f"{n_obj} objects out")

    # warm-rep timing is the steady-state number (first rep pays compiles)
    steady = rows[-1]
    print(f"\nsteady state: RANSAC {steady['ransac_total_s']*1e3:.0f} ms, "
          f"BA {steady['ba_total_s']*1e3:.0f} ms "
          f"({len(candidates)} candidates, {args.n_views} views)")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(dict(config=vars(args), rows=rows), f, indent=2,
                      default=float)
    return rows


if __name__ == "__main__":
    main()
