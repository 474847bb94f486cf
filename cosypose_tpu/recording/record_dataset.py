"""Chunked, resumable synthetic dataset recording in BOP layout.

Capability match for the reference's ``cosypose/recording/record_dataset.py`` +
``record_chunk.py``: fan out fixed-size chunks (seed = chunk id), resume from a
ledger of completed chunks, split train/val keys. Differences (TPU-first):
frames come from the on-device RecordingSceneSampler instead of pybullet
workers, the output is written directly in BOP layout (one scene dir per
chunk — readable by data.bop.BOPDataset, instead of the reference's pickled
jpeg buffers), and fan-out is a thread pool feeding the single TPU (the
reference fans out to dask CPU workers because its renderer is CPU-bound).
"""

from __future__ import annotations

import json
import pathlib

import numpy as np
from PIL import Image

from ..utils.logging import get_logger

logger = get_logger(__name__)


def record_chunk(sampler, ds_dir, chunk_id: int, n_frames_per_chunk: int = 100):
    """Generate one chunk → BOP scene dir <ds_dir>/train_synt/<chunk_id>."""
    scene_dir = pathlib.Path(ds_dir) / "train_synt" / f"{chunk_id:06d}"
    (scene_dir / "rgb").mkdir(parents=True, exist_ok=True)
    (scene_dir / "mask_visib").mkdir(exist_ok=True)
    (scene_dir / "depth").mkdir(exist_ok=True)

    cams, gts, gt_infos = {}, {}, {}
    # multi-view scenes: one sampled scene yields several frames (amortizes
    # scene setup + batches cameras into one rasterizer dispatch)
    n_views = max(1, int(getattr(sampler, "n_views_per_scene", 1)))
    pending = []
    for view_id in range(n_frames_per_chunk):
        seed = chunk_id * n_frames_per_chunk + view_id
        if not pending:
            want = min(n_views, n_frames_per_chunk - view_id)
            pending = list(sampler.sample_scene_frames(seed, want)) \
                if n_views > 1 else [sampler.sample_frame(seed)]
        rgb, mask, obs = pending.pop(0)
        Image.fromarray(rgb).save(scene_dir / "rgb" / f"{view_id:06d}.png")
        depth = obs["camera"].get("depth")
        if depth is not None:
            depth_mm = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)
            Image.fromarray(depth_mm).save(
                scene_dir / "depth" / f"{view_id:06d}.png"
            )
        cam = obs["camera"]
        TWC = cam["TWC"]
        TCW = np.linalg.inv(TWC)
        cams[str(view_id)] = dict(
            cam_K=np.asarray(cam["K"]).reshape(-1).tolist(),
            cam_R_w2c=TCW[:3, :3].reshape(-1).tolist(),
            cam_t_w2c=(TCW[:3, 3] * 1000.0).tolist(),
            depth_scale=1.0,
        )
        gt_rows, info_rows = [], []
        for n, obj in enumerate(obs["objects"]):
            TCO = TCW @ obj["TWO"]
            gt_rows.append(
                dict(
                    obj_id=int(obj["label"].split("_")[-1]),
                    cam_R_m2c=TCO[:3, :3].reshape(-1).tolist(),
                    cam_t_m2c=(TCO[:3, 3] * 1000.0).tolist(),
                )
            )
            x1, y1, x2, y2 = obj["bbox"]
            ox1, oy1, ox2, oy2 = obj.get("bbox_obj", obj["bbox"])
            info_rows.append(
                dict(
                    visib_fract=float(obj.get("visib_fract", 1.0)),
                    bbox_visib=[int(x1), int(y1), int(x2 - x1), int(y2 - y1)],
                    bbox_obj=[int(ox1), int(oy1), int(ox2 - ox1),
                              int(oy2 - oy1)],
                )
            )
            m = (mask == obj["id_in_segm"]).astype(np.uint8) * 255
            Image.fromarray(m).save(
                scene_dir / "mask_visib" / f"{view_id:06d}_{n:06d}.png"
            )
        gts[str(view_id)] = gt_rows
        gt_infos[str(view_id)] = info_rows

    (scene_dir / "scene_camera.json").write_text(json.dumps(cams))
    (scene_dir / "scene_gt.json").write_text(json.dumps(gts))
    (scene_dir / "scene_gt_info.json").write_text(json.dumps(gt_infos))
    return chunk_id


def _record_worker(sampler_factory, ds_dir, chunk_ids, n_frames_per_chunk,
                   ledger):
    """One fan-out worker: builds its own sampler, records its chunk slice.

    Runs on the host CPU (each spawned process forces the JAX CPU platform so
    workers parallelize across cores instead of serializing on the one TPU).
    """
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    # shared CPU compile cache: workers render identical (bucketed) shapes
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/cosypose_tpu_record_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    sampler = sampler_factory()
    for cid in chunk_ids:
        record_chunk(sampler, ds_dir, cid, n_frames_per_chunk)
        with open(ledger, "a") as f:  # O_APPEND single-line write: atomic
            f.write(f"{cid}\n")


def record_dataset(sampler, ds_dir, n_chunks: int, n_frames_per_chunk: int = 100,
                   train_fraction: float = 0.95, n_workers: int = 0,
                   sampler_factory=None):
    """Resumable chunk ledger + train/val split keys
    (ref: record_dataset.py:23-63,130-134).

    With ``n_workers > 0`` and a picklable zero-arg ``sampler_factory``,
    pending chunks fan out over worker processes — the capability match for
    the reference's dask cluster fan-out (ref: record_dataset.py:86-120),
    sized for one machine. The ledger keeps the fan-out resumable exactly as
    in the serial path.
    """
    ds_dir = pathlib.Path(ds_dir)
    ds_dir.mkdir(parents=True, exist_ok=True)
    ledger = ds_dir / "chunks_recorded.txt"
    done = set()
    if ledger.exists():
        done = {int(l) for l in ledger.read_text().split() if l.strip()}
    pending = [c for c in range(n_chunks) if c not in done]

    if n_workers > 0 and sampler_factory is not None and len(pending) > 1:
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        slices = [pending[i::n_workers] for i in range(n_workers)]
        procs = [
            ctx.Process(
                target=_record_worker,
                args=(sampler_factory, ds_dir, s, n_frames_per_chunk, ledger),
            )
            for s in slices if s
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        bad = [p.exitcode for p in procs if p.exitcode != 0]
        if bad:
            raise RuntimeError(
                f"{len(bad)} recording workers failed (exit codes {bad}); "
                f"re-run to resume from the ledger"
            )
        logger.info(f"recorded {len(pending)} chunks on {len(procs)} workers")
    else:
        # serial fallback also serves the fan-out path's degenerate cases
        # (one pending chunk, --debug): build the sampler from the factory
        # when the caller only provided one
        if sampler is None:
            assert sampler_factory is not None, "need a sampler or a factory"
            sampler = sampler_factory()
        for chunk_id in pending:
            record_chunk(sampler, ds_dir, chunk_id, n_frames_per_chunk)
            with open(ledger, "a") as f:
                f.write(f"{chunk_id}\n")
            logger.info(f"recorded chunk {chunk_id + 1}/{n_chunks}")

    n_train = int(train_fraction * n_chunks)
    split = dict(
        train=[f"{c:06d}" for c in range(n_train)],
        val=[f"{c:06d}" for c in range(n_train, n_chunks)],
    )
    (ds_dir / "split_keys.json").write_text(json.dumps(split))
    return ds_dir
