"""Multi-host gather: 8 real processes shard an eval workload and reproduce
single-process metrics exactly (VERDICT #7; ref: the reference's shared-FS
gathers in utils/tensor_collection.py:142-163 and meters/base.py:21-45).

The gather is file-based (like the reference's), so the test drives REAL
separate processes with explicit (process_id, n_processes) — no jax.distributed
bring-up needed, which is also the API's documented offline mode.
"""

import json
import multiprocessing as mp
import pickle

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow

N_PROC = 8


def _make_fixture(seed=0, n_frames=24):
    rng = np.random.RandomState(seed)
    rows_gt, rows_pred, poses_gt, poses_pred = [], [], [], []
    for f in range(n_frames):
        for inst in range(rng.randint(1, 4)):
            label = f"obj_{rng.randint(1, 3):06d}"
            T = np.eye(4, dtype=np.float64)
            T[:3, 3] = rng.uniform(-0.1, 0.1, 3)
            rows_gt.append(dict(scene_id=0, view_id=f, label=label,
                                visib_fract=1.0))
            poses_gt.append(T)
            Tp = T.copy()
            Tp[:3, 3] += rng.uniform(-0.01, 0.01, 3)
            rows_pred.append(dict(scene_id=0, view_id=f, label=label,
                                  score=float(rng.rand())))
            poses_pred.append(Tp)
    return (pd.DataFrame(rows_gt), np.stack(poses_gt),
            pd.DataFrame(rows_pred), np.stack(poses_pred))


def _worker(pid, gather_dir, out_path):
    # fresh process: force CPU before any jax usage
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cosypose_tpu.evaluation.meters import PoseErrorMeter
    from cosypose_tpu.ops.mesh_db import build_mesh_db
    from cosypose_tpu.utils.tensor_collection import PandasTensorCollection
    from tests.test_pose_predictor import cube_specs

    gt_infos, gt_poses, pred_infos, pred_poses = _make_fixture()
    # shard by frame: process p owns views p, p+N, ...
    own = lambda df: (df["view_id"] % N_PROC == pid).values
    g_sel, p_sel = own(gt_infos), own(pred_infos)

    mesh_db = build_mesh_db(cube_specs())
    meter = PoseErrorMeter(mesh_db, error_type="ADD", report_error_AUC=True)
    if g_sel.any():
        meter.add(
            PandasTensorCollection(
                pred_infos[p_sel].reset_index(drop=True),
                poses=jnp.asarray(pred_poses[p_sel]),
            ),
            PandasTensorCollection(
                gt_infos[g_sel].reset_index(drop=True),
                poses=jnp.asarray(gt_poses[g_sel]),
            ),
        )
    meter.gather_multihost(gather_dir, process_id=pid, n_processes=N_PROC)
    summary, _ = meter.summary()

    # also gather a ragged prediction collection
    preds = PandasTensorCollection(
        pred_infos[p_sel].reset_index(drop=True),
        poses=jnp.asarray(pred_poses[p_sel]),
    )
    gathered = preds.gather_multihost(
        str(gather_dir) + "_tc", process_id=pid, n_processes=N_PROC
    )
    with open(out_path, "wb") as f:
        pickle.dump(
            dict(summary=summary, n_gathered=len(gathered),
                 gathered_views=sorted(gathered.infos["view_id"].unique()
                                       .tolist())),
            f,
        )


def test_eight_process_gather_reproduces_single_process(tmp_path):
    # single-process baseline
    import jax.numpy as jnp

    from cosypose_tpu.evaluation.meters import PoseErrorMeter
    from cosypose_tpu.ops.mesh_db import build_mesh_db
    from cosypose_tpu.utils.tensor_collection import PandasTensorCollection
    from tests.test_pose_predictor import cube_specs

    gt_infos, gt_poses, pred_infos, pred_poses = _make_fixture()
    mesh_db = build_mesh_db(cube_specs())
    ref_meter = PoseErrorMeter(mesh_db, error_type="ADD",
                               report_error_AUC=True)
    ref_meter.add(
        PandasTensorCollection(pred_infos, poses=jnp.asarray(pred_poses)),
        PandasTensorCollection(gt_infos, poses=jnp.asarray(gt_poses)),
    )
    ref_summary, _ = ref_meter.summary()

    ctx = mp.get_context("spawn")
    outs = [tmp_path / f"out_{p}.pkl" for p in range(N_PROC)]
    procs = [
        ctx.Process(target=_worker, args=(p, tmp_path / "gather", outs[p]))
        for p in range(N_PROC)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=600)
    assert all(p.exitcode == 0 for p in procs), [p.exitcode for p in procs]

    n_total = len(pred_infos)
    for out in outs:
        got = pickle.loads(out.read_bytes())
        assert got["n_gathered"] == n_total
        for key in ("AUC", "0.1d", "n_gt", "n_matched"):
            ref_v = ref_summary[key]
            got_v = got["summary"][key]
            assert got_v == pytest.approx(ref_v, abs=1e-12), (key, got_v, ref_v)
