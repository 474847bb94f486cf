"""Build the YCB-V 'bop-compat' model sets used by the paper protocol.

Capability match for the reference's ``cosypose/scripts/make_ycbv_compat_models.py``
(:19-49): from a downloaded ycbv BOP pack (+ the original YCB `models_original`
point clouds, `offsets.txt` and `ycbv_friendly_names.txt`):

  * models_bop-compat       — BOP models with master_chef_can / large_marker
    forced asymmetric (matches the original YCB-Video evaluation convention);
  * models_bop-compat_eval  — the original YCB point clouds, shifted by the
    per-object offsets into the BOP frame (PLY point clouds; the reference
    writes these with trimesh, absent here — ops/mesh_io.save_ply instead).

  python -m cosypose_tpu.scripts.make_ycbv_compat_models [--ds-dir PATH]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shutil
from copy import deepcopy

import numpy as np

from ..config import LOCAL_DATA_DIR
from ..ops.mesh_io import save_ply
from ..utils.logging import get_logger

logger = get_logger(__name__)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ds-dir", default=None,
                        help="ycbv BOP dataset dir (default <data>/bop_datasets/ycbv)")
    args = parser.parse_args()
    ds_dir = pathlib.Path(args.ds_dir or LOCAL_DATA_DIR / "bop_datasets/ycbv")
    models_dir = ds_dir / "models"

    orig_names = {}
    for line in (ds_dir / "ycbv_friendly_names.txt").read_text().split("\n"):
        if line.strip():
            k, v = line.split(" ")
            orig_names[str(int(k))] = v

    infos = json.loads((models_dir / "models_info.json").read_text())
    compat_infos = deepcopy(infos)
    # these two are treated as asymmetric in the original YCB-Video protocol
    for str_obj_id, orig_name in orig_names.items():
        if orig_name in ("002_master_chef_can", "040_large_marker"):
            compat_infos[str_obj_id]["symmetries_discrete"] = []
            compat_infos[str_obj_id]["symmetries_continuous"] = []

    bop_compat_dir = ds_dir / "models_bop-compat"
    bop_compat_dir.mkdir(exist_ok=True)
    for file_path in models_dir.iterdir():
        shutil.copy(file_path, bop_compat_dir / file_path.name)
    (bop_compat_dir / "models_info.json").write_text(json.dumps(compat_infos))
    logger.info(f"wrote {bop_compat_dir}")

    offsets = {}
    for line in (ds_dir / "offsets.txt").read_text().split("\n"):
        if line.strip():
            offsets[str(int(line[:2]))] = np.array(json.loads(line[3:]))

    bop_compat_eval_dir = ds_dir / "models_bop-compat_eval"
    bop_compat_eval_dir.mkdir(exist_ok=True)
    (bop_compat_eval_dir / "models_info.json").write_text(
        json.dumps(compat_infos)
    )
    for obj_id, orig_name in orig_names.items():
        xyz = (ds_dir / "models_original" / orig_name / "points.xyz").read_text()
        pts = np.array(
            [list(map(float, l.split(" "))) for l in xyz.split("\n") if l]
        )
        vertices = pts * 1000.0 + offsets[obj_id]
        save_ply(bop_compat_eval_dir / f"obj_{int(obj_id):06d}.ply", vertices)
    logger.info(f"wrote {bop_compat_eval_dir}")


if __name__ == "__main__":
    main()
