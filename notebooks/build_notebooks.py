"""Author + execute the repo's notebooks programmatically.

The reference ships six notebooks (ref: notebooks/ — inspect_dataset,
render_dataset, paper_training_logs, visualize_singleview_predictions,
visualize_multiview_predictions, make_ycbv_per_object). This script builds the
tpu-native equivalents with nbformat and executes them with nbclient so the
committed .ipynb files carry real outputs (make_ycbv_per_object is covered by
``scripts/make_ycbv_compat_models.py`` instead — it is a one-off asset prep).

Usage:  python notebooks/build_notebooks.py [--no-execute] [names...]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import nbformat
from nbformat.v4 import new_code_cell, new_markdown_cell, new_notebook

HERE = pathlib.Path(__file__).resolve().parent
ROOT = HERE.parent

SETUP = """\
import pathlib, sys
root = pathlib.Path.cwd()
while not (root / "cosypose_tpu").exists():
    root = root.parent
sys.path.insert(0, str(root))
import os
os.chdir(root)

import jax
jax.config.update("jax_platforms", "cpu")  # notebooks run anywhere; drop on a TPU host
import numpy as np
import matplotlib.pyplot as plt
%matplotlib inline
"""

# run ids used by the prediction notebooks — retrain with the commands in the
# README "End-to-end accuracy" section, or point at your own runs
PARAMS = """\
DETECTOR_RUN = "detector-procedural-all"
COARSE_RUN = None                                # box-seeded init when None
REFINER_RUN = "procedural-diag-lr0.003-rot-solo-it2-ep30"
VAL_DATASET = "synthetic.procedural-solo.val"
"""

NOTEBOOKS = {}

NOTEBOOKS["inspect_dataset"] = [
    ("md", "# Inspect a recorded dataset\n"
           "The tpu-native equivalent of the reference's "
           "`notebooks/inspect_dataset.ipynb`: load a recorded BOP-layout "
           "scene dataset, look at the frame index, an image, its GT "
           "instance masks and boxes."),
    ("code", SETUP),
    ("code", """\
from cosypose_tpu.data.datasets_cfg import make_scene_dataset
ds = make_scene_dataset("synthetic.procedural-solo.val")
print(len(ds), "frames")
ds.frame_index.head()"""),
    ("code", """\
rgb, mask, obs = ds[0]
fig, axes = plt.subplots(1, 2, figsize=(9, 3.2), dpi=80)
axes[0].imshow(rgb); axes[0].set_title("rgb"); axes[0].axis("off")
axes[1].imshow(mask); axes[1].set_title("instance id mask"); axes[1].axis("off")
plt.close(fig)
fig"""),
    ("code", """\
# per-object GT: pose (TWO), bbox, visibility stats
import pandas as pd
pd.DataFrame([
    dict(label=o["label"], bbox=np.round(o["bbox"], 1).tolist(),
         visib_fract=round(float(o.get("visib_fract", 1.0)), 3))
    for o in obs["objects"]
])"""),
    ("code", """\
from matplotlib import patches
fig, ax = plt.subplots(figsize=(5, 3.6), dpi=80)
ax.imshow(rgb); ax.axis("off")
for o in obs["objects"]:
    x1, y1, x2, y2 = o["bbox"]
    ax.add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                   fill=False, color="lime", lw=1.5))
    ax.text(x1, y1 - 3, o["label"], color="lime", fontsize=8)
plt.close(fig)
fig"""),
]

NOTEBOOKS["render_dataset"] = [
    ("md", "# Render the object models\n"
           "Equivalent of the reference's `notebooks/render_dataset.ipynb`: "
           "drive the on-device rasterizer over the procedural object set "
           "(the same `SceneRenderer` the recording pipeline uses)."),
    ("code", SETUP),
    ("code", """\
from cosypose_tpu.data.procedural_objects import ProceduralObjectDataset
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.rendering.scene_renderer import SceneRenderer

obj_ds = ProceduralObjectDataset()
mesh_db = build_mesh_db(obj_ds.mesh_specs())
renderer = SceneRenderer(mesh_db)
print(obj_ds.labels)"""),
    ("code", """\
h, w = 120, 160
K = np.array([[180.0, 0, w / 2], [0, 180.0, h / 2], [0, 0, 1]], np.float32)
fig, axes = plt.subplots(2, 4, figsize=(10, 4), dpi=80)
for ax, label in zip(axes.ravel(), obj_ds.labels):
    TWO = np.eye(4, dtype=np.float32)
    TWO[:3, :3] = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    TWO[:3, 3] = [0, 0, 0.35]
    out = renderer.render_scene(
        [dict(label=label, TWO=TWO)],
        [dict(K=K, TWC=np.eye(4, dtype=np.float32), resolution=(h, w))],
    )[0]
    ax.imshow(np.clip(out["rgb"], 0, 1)); ax.set_title(label, fontsize=8)
    ax.axis("off")
plt.close(fig)
fig"""),
]

NOTEBOOKS["training_logs"] = [
    ("md", "# Training-log dashboards\n"
           "Equivalent of the reference's `notebooks/paper_training_logs.ipynb` "
           "(bokeh is not in this image — matplotlib versions of the same "
           "curves). Every run directory holds a jsonlines `log.txt`; the "
           "in-training eval bundle adds held-out per-pair ADD metrics at "
           "`val_epoch_interval` (ref: training/train_pose.py:76-185 "
           "`make_eval_bundle`)."),
    ("code", SETUP),
    ("code", """\
import json
exp_dir = pathlib.Path("local_data/experiments")
runs = sorted(d.name for d in exp_dir.iterdir()
              if (d / "log.txt").exists() and "debug" not in d.name)
print("\\n".join(runs))"""),
    ("code", """\
from cosypose_tpu.visualization.plotter import plot_training_logs
pose_runs = [exp_dir / r for r in runs if r.startswith("procedural-diag")]
fig = plot_training_logs(pose_runs, metrics=("train/loss_total",))
plt.close(fig)
fig"""),
    ("code", """\
# held-out eval-bundle curves (init vs refined per-pair ADD) for one run
run = exp_dir / "procedural-diag-lr0.003-coarse-solo-ep30"
recs = [json.loads(l) for l in open(run / "log.txt")]
ev = [r for r in recs if any(k.startswith("test/") for k in r)]
ep = [r["epoch"] for r in ev]
init = [r.get("test/init/ADD_median", np.nan) for r in ev]
it1 = [r.get("test/iter=1/ADD_median", np.nan) for r in ev]
fig, ax = plt.subplots(figsize=(6, 3), dpi=80)
ax.plot(ep, init, "o-", label="init ADD median")
ax.plot(ep, it1, "s-", label="iter=1 ADD median")
ax.set_xlabel("epoch"); ax.set_ylabel("m"); ax.legend(); ax.grid(alpha=.3)
ax.set_title(run.name)
plt.close(fig)
fig"""),
    ("md", "Interactive version: `make_dashboard` writes a self-contained "
           "HTML dashboard (hover tooltips, click-to-hide runs, log scale, "
           "config diff) — the bokeh-dashboard equivalent "
           "(ref: utils/logs_bokeh.py)."),
    ("code", """\
from cosypose_tpu.visualization.dashboard import make_dashboard
out = make_dashboard(pose_runs, exp_dir / "dashboard.html")
print(out, f"{out.stat().st_size/1e3:.0f} kB")"""),
]

NOTEBOOKS["visualize_singleview_predictions"] = [
    ("md", "# Single-view predictions\n"
           "Equivalent of the reference's "
           "`notebooks/visualize_singleview_predictions.ipynb`: run the full "
           "trained detector → (coarse) → refiner pipeline on a held-out "
           "recorded frame and overlay the predicted poses."),
    ("code", SETUP),
    ("code", PARAMS),
    ("code", """\
import jax.numpy as jnp
from cosypose_tpu.data.datasets_cfg import make_scene_dataset
from cosypose_tpu.data.procedural_objects import ProceduralObjectDataset
from cosypose_tpu.ops.mesh_db import build_mesh_db
from cosypose_tpu.scripts.run_bop_inference import load_detector, load_pose_model
from cosypose_tpu.integrated.pose_predictor import CoarseRefinePosePredictor

obj_ds = ProceduralObjectDataset()
mesh_db = build_mesh_db(obj_ds.mesh_specs())
labels = {l: i for i, l in enumerate(obj_ds.labels)}
detector = load_detector(DETECTOR_RUN, labels)
coarse = load_pose_model(COARSE_RUN, mesh_db) if COARSE_RUN else None
refiner = load_pose_model(REFINER_RUN, mesh_db)
predictor = CoarseRefinePosePredictor(coarse, refiner)"""),
    ("code", """\
ds = make_scene_dataset(VAL_DATASET)
rgb, _, obs = ds[0]
K = np.asarray(obs["camera"]["K"], np.float32)
dets = detector.get_detections(jnp.asarray(rgb)[None], detection_th=0.3)
dets.infos"""),
    ("code", """\
preds, _ = predictor.get_predictions(
    jnp.asarray(rgb)[None], jnp.asarray(K)[None], detections=dets,
    n_coarse_iterations=1 if coarse else 0, n_refiner_iterations=2,
)
from cosypose_tpu.visualization.singleview import render_prediction_overlay
overlay = rgb.copy()
for n in range(len(preds)):
    overlay = render_prediction_overlay(
        mesh_db, overlay, np.asarray(preds.poses[n]), K,
        preds.infos["label"].iloc[n])
fig, axes = plt.subplots(1, 2, figsize=(9, 3.2), dpi=80)
axes[0].imshow(rgb); axes[0].set_title("input"); axes[0].axis("off")
axes[1].imshow(overlay); axes[1].set_title("predicted poses"); axes[1].axis("off")
plt.close(fig)
fig"""),
]

NOTEBOOKS["visualize_multiview_predictions"] = [
    ("md", "# Multi-view scene reconstruction\n"
           "Equivalent of the reference's "
           "`notebooks/visualize_multiview_predictions.ipynb`: run the "
           "object-level RANSAC matching + bundle adjustment on single-view "
           "candidates from 3 cameras, recover the scene and orbit-render it "
           "(ref: cosypose/visualization/multiview.py:55-141)."),
    ("code", SETUP),
    ("code", """\
# a 3-camera / 3-object synthetic scene with noisy single-view candidates
import jax.numpy as jnp, pandas as pd
from cosypose_tpu.ops.mesh_db import MeshSpec, build_mesh_db

def cube(s):
    v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)],
                 float)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    f = [t for a, b, c, d in quads for t in ((a, b, c), (a, c, d))]
    return v, np.asarray(f)

def rot(axis, a):
    c, s = np.cos(a), np.sin(a)
    return {"z": np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]),
            "y": np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]),
            "x": np.array([[1, 0, 0], [0, c, -s], [0, s, c]])}[axis]

specs = []
for i in range(3):
    v, f = cube(0.03 * (i + 1))
    specs.append(MeshSpec(label=f"obj_{i}", vertices=v * 1000, faces=f))
mesh_db_aabb = build_mesh_db(specs, aabb=True, keep_geometry=False)
mesh_db_geom = build_mesh_db(specs)

rng = np.random.RandomState(0)
TWO, TWC = [], []
for i in range(3):
    T = np.eye(4); T[:3, :3] = rot("z", .3 * i) @ rot("x", .2 * i)
    T[:3, 3] = [.2 * i - .2, .05 * i, .1]; TWO.append(T)
for v_ in range(3):
    T = np.eye(4); T[:3, :3] = rot("y", .4 * v_ - .4)
    T[:3, 3] = [.3 * v_ - .3, 0, -1.]; TWC.append(T)
rows, poses = [], []
for v_ in range(3):
    for o in range(3):
        TCO = np.linalg.inv(TWC[v_]) @ TWO[o]
        TCO[:3, 3] += rng.normal(scale=2e-3, size=3)
        rows.append(dict(view_id=v_, label=f"obj_{o}", score=.9))
        poses.append(TCO)
from cosypose_tpu.utils.tensor_collection import PandasTensorCollection
candidates = PandasTensorCollection(
    pd.DataFrame(rows), poses=jnp.asarray(np.stack(poses), jnp.float32))
candidates.infos.head()"""),
    ("code", """\
from cosypose_tpu.multiview import multiview_candidate_matching
out = multiview_candidate_matching(
    candidates, mesh_db_aabb, n_ransac_iter=20, dist_threshold=0.02,
    n_min_inliers=2)
filtered = out["filtered_candidates"]
print(filtered.infos.groupby("obj_id").size())
# recovered relative camera pose error vs GT
est = np.asarray(out["pairs_TC1C2"].TC1C2[0])
v1, v2 = (int(out["pairs_TC1C2"].infos[k].iloc[0]) for k in ("view1", "view2"))
gt = np.linalg.inv(TWC[v1]) @ TWC[v2]
print("relative-pose error:", float(np.abs(est - gt).max()))"""),
    ("code", """\
# scene-level: objects in world frame (candidate group medioids) → orbit render
from cosypose_tpu.visualization.multiview import make_scene_renderings
objs = []
for oid, g in filtered.infos.groupby("obj_id"):
    n = g.index[0]
    v_ = int(g["view_id"].iloc[0])
    TWO_est = TWC[v_] @ np.asarray(filtered.poses[n])
    objs.append(dict(label=g["label"].iloc[0], TWO=TWO_est, score=1.0))
objects = PandasTensorCollection(
    pd.DataFrame([dict(label=o["label"], score=o["score"]) for o in objs]),
    TWO=jnp.asarray(np.stack([o["TWO"] for o in objs]), jnp.float32))
frames = make_scene_renderings(objects, None, mesh_db_geom, n_frames=4,
                               resolution=(120, 160), orbit_radius=1.2)
fig, axes = plt.subplots(1, 4, figsize=(11, 2.4), dpi=80)
for ax, fr in zip(axes, frames):
    ax.imshow(fr); ax.axis("off")
plt.close(fig)
fig"""),
]


def build(name, cells, execute=True):
    nb = new_notebook(metadata={"kernelspec": {
        "name": "python3", "display_name": "Python 3", "language": "python"}})
    for kind, src in cells:
        nb.cells.append(new_markdown_cell(src) if kind == "md"
                        else new_code_cell(src))
    if execute:
        from nbclient import NotebookClient

        client = NotebookClient(nb, timeout=900, kernel_name="python3",
                                resources={"metadata": {"path": str(ROOT)}})
        client.execute()
    out = HERE / f"{name}.ipynb"
    nbformat.write(nb, out)
    print(f"wrote {out}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("names", nargs="*", default=None)
    parser.add_argument("--no-execute", action="store_true")
    args = parser.parse_args()
    names = args.names or list(NOTEBOOKS)
    for name in names:
        build(name, NOTEBOOKS[name], execute=not args.no_execute)


if __name__ == "__main__":
    main()
