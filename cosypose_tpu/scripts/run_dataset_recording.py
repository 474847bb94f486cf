"""Synthetic dataset recording CLI.

Capability match for the reference's ``cosypose/scripts/run_dataset_recording.py``
(:22-59 configs): named configs for ycbv-like (640×480) and tless-like
(720×540) 1M-frame synthetic sets, generated with the on-device scene sampler
into BOP layout.

  python -m cosypose_tpu.scripts.run_dataset_recording --config ycbv-1M [--debug]
"""

from __future__ import annotations

import argparse

from ..config import LOCAL_DATA_DIR
from ..data.datasets_cfg import make_object_dataset
from ..ops.mesh_db import build_mesh_db
from ..recording import RecordingSceneSampler, record_dataset
from ..utils.logging import get_logger

logger = get_logger(__name__)

CONFIGS = dict(
    # (object ds, resolution, focal interval, n frames)
    **{"ycbv-1M": dict(obj="ycbv.models", resolution=(480, 640),
                       focal=(1060.0, 1080.0), n_frames=1_000_000)},
    **{"tless-1M": dict(obj="tless.cad", resolution=(540, 720),
                        focal=(1060.0, 1080.0), n_frames=1_000_000)},
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, choices=list(CONFIGS))
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--ds-root", default=None)
    parser.add_argument("--chunk-size", type=int, default=100)
    args = parser.parse_args()

    cfg = CONFIGS[args.config]
    obj_ds = make_object_dataset(cfg["obj"], ds_root=args.ds_root)
    mesh_db = build_mesh_db(obj_ds.mesh_specs())

    sampler = RecordingSceneSampler(
        mesh_db, resolution=cfg["resolution"], focal_interval=cfg["focal"]
    )
    n_frames = 10 if args.debug else cfg["n_frames"]
    n_chunks = max(1, n_frames // args.chunk_size)
    out = LOCAL_DATA_DIR / "synt_datasets" / (
        args.config + ("-debug" if args.debug else "")
    )
    record_dataset(sampler, out, n_chunks=n_chunks,
                   n_frames_per_chunk=args.chunk_size)
    logger.info(f"Recorded {n_chunks} chunks into {out}")


if __name__ == "__main__":
    main()
