"""Reference (torch CPU) multiview RANSAC + BA baseline at protocol scale.

Runs the REFERENCE implementation (/root/reference/cosypose/multiview/
ransac.py + bundle_adjustment.py, loaded in place with torch CPU) on the
exact scenario bench_multiview.py times for the rebuild, so
results/bench-multiview-protocol.json can carry a matching-or-beating
anchor (BASELINE.md has no multiview number; the reference self-reports BA
as its bottleneck, ref README.md:440).

Shims (timing-neutral):
  * cosypose_cext → this repo's compiled C ABI extension
    (csrc/matching.cpp, same four algorithms, -O3) via an adapter module —
    the reference's own extension is not built in this image;
    expand_ids_for_symmetry is a two-line numpy repeat.
  * np.int/np.float → int/float (removed numpy 1.24 aliases used by the
    reference's bookkeeping code paths).
  * trimesh → empty module (only needed by MeshDataBase loaders; the
    benchmark constructs BatchedMeshes directly from the same AABB corner
    points + symmetries the rebuild's mesh_db uses).

  python -m cosypose_tpu.scripts.bench_multiview_ref [--n-views 8] ...
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import types
import pathlib

import numpy as np

REF = pathlib.Path("/root/reference")


def _install_shims():
    np.int = int  # noqa: NPY001 — reference uses the numpy<1.24 alias
    np.float = float

    from cosypose_tpu.multiview import matching_cext

    shim = types.ModuleType("cosypose_cext")

    def make_ransac_infos(view_ids, labels, n_ransac_iter, seed):
        labels = np.asarray(labels)
        _, codes = np.unique(labels, return_inverse=True)
        return matching_cext.make_ransac_infos(
            np.asarray(view_ids, np.int32), codes.astype(np.int32),
            int(n_ransac_iter), int(seed),
        )

    def find_ransac_inliers(v1, v2, hyp, c1, c2, dists, th, n_min):
        return matching_cext.find_ransac_inliers(
            np.asarray(v1, np.int32), np.asarray(v2, np.int32),
            np.asarray(hyp, np.int32), np.asarray(c1, np.int32),
            np.asarray(c2, np.int32), np.asarray(dists, np.float32),
            float(th), int(n_min),
        )

    def scatter_argmin(values, ids):
        return matching_cext.scatter_argmin(
            np.asarray(values, np.float32), np.asarray(ids, np.int32))

    def expand_ids_for_symmetry(labels, n_sym_mapping):
        n_sym = np.array([n_sym_mapping[l] for l in labels], np.int64)
        ids_expand = np.repeat(np.arange(len(labels)), n_sym)
        sym_ids = np.concatenate([np.arange(n) for n in n_sym]) if len(
            n_sym) else np.zeros(0, np.int64)
        return ids_expand, sym_ids

    shim.make_ransac_infos = make_ransac_infos
    shim.find_ransac_inliers = find_ransac_inliers
    shim.scatter_argmin = scatter_argmin
    shim.expand_ids_for_symmetry = expand_ids_for_symmetry
    sys.modules["cosypose_cext"] = shim
    sys.modules.setdefault("trimesh", types.ModuleType("trimesh"))
    # lib3d/__init__ imports Transform (a pinocchio SE3 wrapper) which the
    # benchmark never instantiates; an empty module satisfies the import
    sys.modules.setdefault("pinocchio", types.ModuleType("pinocchio"))
    sys.modules.setdefault("transforms3d", types.ModuleType("transforms3d"))
    eigenpy = types.ModuleType("eigenpy")
    eigenpy.switchToNumpyArray = lambda: None
    sys.modules.setdefault("eigenpy", eigenpy)
    # the reference's LM step hardcodes `.cuda()` after its CPU pinverse
    # (bundle_adjustment.py:221); torch here is CPU-only, so `.cuda()`
    # becomes identity — the math and device (CPU pinverse) are unchanged
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self


def _load_reference():
    sys.path.insert(0, str(REF))
    _install_shims()
    import cosypose.multiview.ransac as ref_ransac  # noqa: E402
    import cosypose.multiview.bundle_adjustment as ref_ba  # noqa: E402
    import cosypose.lib3d.rigid_mesh_database as ref_meshdb  # noqa: E402
    import cosypose.utils.tensor_collection as ref_tc  # noqa: E402

    return ref_ransac, ref_ba, ref_meshdb, ref_tc


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-views", type=int, default=8)
    parser.add_argument("--n-objects", type=int, default=12)
    parser.add_argument("--n-labels", type=int, default=6)
    parser.add_argument("--dup", type=int, default=4)
    parser.add_argument("--outliers", type=int, default=5)
    parser.add_argument("--ransac-iter", type=int, default=2000)
    parser.add_argument("--ba-iter", type=int, default=50)
    parser.add_argument("--reps", type=int, default=2)
    parser.add_argument("--json", default=None)
    args = parser.parse_args(argv)

    import torch

    from cosypose_tpu.ops.mesh_db import build_mesh_db
    from cosypose_tpu.scripts.bench_multiview import _cube_specs, make_scenario

    ref_ransac, ref_ba, ref_meshdb, ref_tc = _load_reference()

    # identical geometry to the rebuild's bench: AABB corners + identity sym
    mesh_db = build_mesh_db(_cube_specs(args.n_labels), aabb=True,
                            keep_geometry=False)
    labels = list(mesh_db.labels)
    points_t = torch.as_tensor(np.asarray(mesh_db.points), dtype=torch.float32)
    syms_t = torch.as_tensor(np.asarray(mesh_db.symmetries),
                             dtype=torch.float32)
    infos = {l: dict(n_sym=int(np.asarray(mesh_db.sym_valid)[i].sum()))
             for i, l in enumerate(labels)}
    ref_db = ref_meshdb.BatchedMeshes(infos, labels, points_t, syms_t)

    candidates_j, cameras_j = make_scenario(
        args.n_views, args.n_objects, args.n_labels, args.dup, args.outliers,
        noise_t=0.004, noise_deg=2.0,
    )
    candidates = ref_tc.PandasTensorCollection(
        candidates_j.infos.copy(),
        poses=torch.as_tensor(np.asarray(candidates_j.poses),
                              dtype=torch.float32),
    )
    cameras = ref_tc.PandasTensorCollection(
        cameras_j.infos.copy(),
        TWC=torch.as_tensor(np.asarray(cameras_j.TWC), dtype=torch.float32),
        K=torch.as_tensor(np.asarray(cameras_j.K), dtype=torch.float32),
    )
    print(f"scenario: {len(candidates)} candidates over {args.n_views} views "
          f"({args.n_objects} objects, {args.ransac_iter} RANSAC hypotheses) "
          f"— REFERENCE torch {torch.__version__} CPU")

    rows = []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        match = ref_ransac.multiview_candidate_matching(
            candidates=candidates, mesh_db=ref_db,
            n_ransac_iter=args.ransac_iter,
        )
        t_match = time.perf_counter() - t0

        filtered = match["filtered_candidates"]
        group_infos = ref_ba.make_view_groups(match["pairs_TC1C2"])
        filtered.infos = filtered.infos.merge(group_infos, on="view_id")

        t0 = time.perf_counter()
        n_groups, n_obj = 0, 0
        for _, cand_ids in filtered.infos.groupby(
                "view_group").groups.items():
            problem = ref_ba.MultiviewRefinement(
                candidates=filtered[np.asarray(cand_ids)], cameras=cameras,
                pairs_TC1C2=match["pairs_TC1C2"], mesh_db=ref_db,
            )
            ba = problem.solve(n_iterations=args.ba_iter)
            n_groups += 1
            n_obj += len(ba["objects"])
        t_ba = time.perf_counter() - t0

        def _s(v):
            return (v.total_seconds() if hasattr(v, "total_seconds")
                    else float(v))

        rows.append(dict(
            rep=rep, n_candidates=len(candidates), n_matched=len(filtered),
            n_groups=n_groups, n_objects_out=n_obj,
            ransac_models_s=_s(match["time_models"]),
            ransac_score_s=_s(match["time_score"]),
            ransac_misc_s=_s(match["time_misc"]), ransac_total_s=t_match,
            ba_total_s=t_ba,
        ))
        print(f"rep {rep}: ransac {t_match:.2f}s "
              f"(models {_s(match['time_models']):.2f} score "
              f"{_s(match['time_score']):.2f}) ba {t_ba:.2f}s "
              f"over {n_groups} group(s), {n_obj} objects out")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(dict(config=vars(args), backend="reference_torch_cpu",
                           rows=rows), f, indent=2, default=float)
    return rows


if __name__ == "__main__":
    main()
