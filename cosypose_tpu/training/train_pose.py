"""Pose-model training orchestrator.

Capability match for the reference's ``cosypose/training/train_pose.py``: dataset
concat with repeat factors, epoch loop with a fixed epoch_size sampler,
validation interval, per-epoch checkpointing + jsonlines logging, resume and
pretrain-from support.

TPU-first: the train step is one jitted XLA program (training/pose_training.py);
host threads prefetch and collate fixed-shape numpy batches (replacing torch
DataLoader workers + MultiEpochDataLoader, ref: train_pose.py:240-250); data
parallelism is the 1-D mesh (no DDP/process groups, SURVEY.md §2.14).
"""

from __future__ import annotations

import pathlib
import queue
import threading

import jax
import numpy as np

from ..config import EXP_DIR
from ..data.pose_dataset import PoseDataset
from ..data.wrappers import PartialSampler
from ..parallel import make_mesh, shard_batch
from ..utils.logging import get_logger
from .checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    restore_into_state,
    save_checkpoint,
    save_config,
)
from .logs import MetricsAccumulator, RunLogger
from .pose_training import create_train_state, make_train_step, make_val_step

logger = get_logger(__name__)


class ConcatDataset:
    """Dataset concat with integer repeat factors (ref: train_pose.py:216-227)."""

    def __init__(self, datasets_with_repeats):
        self.datasets = []
        for ds, repeat in datasets_with_repeats:
            self.datasets.extend([ds] * int(repeat))
        self.lengths = [len(d) for d in self.datasets]
        self.cum = np.cumsum([0] + self.lengths)

    def __len__(self):
        return int(self.cum[-1])

    def __getitem__(self, idx):
        d = int(np.searchsorted(self.cum[1:], idx, side="right"))
        return self.datasets[d][idx - self.cum[d]]


class PrefetchLoader:
    """Threaded batch prefetcher over a sampler (replaces torch DataLoader)."""

    def __init__(self, dataset, sampler, batch_size, collate_fn, n_workers=4,
                 prefetch=4):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.n_workers = max(n_workers, 1)
        self.prefetch = prefetch

    def __iter__(self):
        ids = list(iter(self.sampler))
        batches = [
            ids[i : i + self.batch_size]
            for i in range(0, len(ids) - self.batch_size + 1, self.batch_size)
        ]
        assert batches, (
            f"epoch_size {len(ids)} < global batch {self.batch_size}: "
            "no full batch can be formed"
        )
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        batch_iter = iter(batches)
        lock = threading.Lock()
        stop = object()

        def worker():
            while True:
                with lock:
                    chunk = next(batch_iter, None)
                if chunk is None:
                    q.put(stop)
                    return
                items = [self.dataset[i] for i in chunk]
                q.put(self.collate_fn(items))

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.n_workers)
        ]
        for t in threads:
            t.start()
        finished = 0
        yielded = 0
        while finished < self.n_workers and yielded < len(batches):
            item = q.get()
            if item is stop:
                finished += 1
                continue
            yielded += 1
            yield item

    def __len__(self):
        return len(list(iter(self.sampler))) // self.batch_size


def train_pose(cfg, scene_datasets=None, mesh_db=None, resume: bool = False,
               pretrain_run_id: str | None = None, exp_dir=None,
               use_mesh: bool | None = None, eval_callback=None):
    """Run the training loop.

    cfg: training.configs.RunConfig. scene_datasets: {'train': [(ds, repeat)],
    'val': [...]} — pass directly (dataset registry needs local BOP data).
    mesh_db: BatchedMeshes with render geometry for the training objects.
    eval_callback: optional fn(state, epoch) → metrics dict, invoked every
    cfg.test_epoch_interval epochs — the in-training full-evaluation hook
    (the reference builds an eval bundle running the whole pred+eval pipeline
    during training, ref: train_pose.py:76-185; here the caller assembles the
    bundle from evaluation.pred_runners/eval_runners and passes it in).
    """
    exp_dir = pathlib.Path(exp_dir or EXP_DIR)
    run_dir = exp_dir / cfg.run_id
    run_dir.mkdir(parents=True, exist_ok=True)
    save_config(run_dir, cfg)
    run_logger = RunLogger(run_dir)

    tcfg = cfg.train
    if use_mesh is None:
        use_mesh = len(jax.devices()) > 1
    mesh = make_mesh() if use_mesh else None
    pp, state = create_train_state(tcfg, jax.random.PRNGKey(0))
    start_epoch = 0

    if pretrain_run_id:
        ckpt = latest_checkpoint(exp_dir / pretrain_run_id)
        assert ckpt is not None, f"no checkpoint for pretrain {pretrain_run_id}"
        payload = load_checkpoint(ckpt)
        state = state.replace(
            params=jax.tree.map(lambda t, v: v, state.params, payload["params"]),
            batch_stats=jax.tree.map(
                lambda t, v: v, state.batch_stats, payload["batch_stats"]
            ),
        )
        logger.info(f"Loaded pretrain weights from {ckpt}")
    if resume:
        ckpt = latest_checkpoint(run_dir)
        if ckpt is not None:
            payload = load_checkpoint(ckpt)
            state = restore_into_state(state, payload)
            start_epoch = int(payload["epoch"]) + 1
            logger.info(f"Resumed from {ckpt} at epoch {start_epoch}")

    step_fn = make_train_step(pp, tcfg, mesh_db, mesh=mesh)
    val_fn = make_val_step(pp, tcfg, mesh_db, mesh=mesh)

    from ..utils.profiling import maybe_start_trace, stop_trace

    maybe_start_trace()  # honors COSYPOSE_TPU_TRACE_DIR

    train_ds = ConcatDataset(scene_datasets["train"])
    val_ds = (
        ConcatDataset(scene_datasets["val"]) if scene_datasets.get("val") else None
    )

    global_batch = tcfg.batch_size * (len(jax.devices()) if mesh else 1)
    rng = jax.random.PRNGKey(1)

    for epoch in range(start_epoch, tcfg.n_epochs):
        sampler = PartialSampler(train_ds, tcfg.epoch_size, seed=epoch)
        loader = PrefetchLoader(
            train_ds, sampler, global_batch, PoseDataset.collate_fn,
            n_workers=max(cfg.n_dataloader_workers, 1),
        )
        acc = MetricsAccumulator()
        import time as _time

        # per-epoch step breakdown: host data wait vs dispatch+device time
        # (the reference logs the same split via its data/forward/backward
        # timers, ref: train_pose.py:304-333)
        t_data = t_step = 0.0
        t_last, n_steps = _time.time(), 0
        t_mark = _time.perf_counter()
        for batch in loader:
            t_data += _time.perf_counter() - t_mark
            rng, step_rng = jax.random.split(rng)
            device_batch = dict(
                images=batch.images,  # uint8; float conversion on device
                K=batch.K,
                TCO=batch.TCO,
                bboxes=batch.bboxes,
                label_ids=np.asarray(
                    mesh_db.ids_for(batch.labels), np.int32
                ),
            )
            if mesh is not None:
                device_batch = shard_batch(mesh, device_batch)
            state, metrics = step_fn(state, device_batch, step_rng)
            acc.add(metrics)  # device values; converted at epoch end
            n_steps += 1
            if _time.time() - t_last > 60.0:
                logger.info(
                    f"epoch {epoch}: step {n_steps}, "
                    f"loss {float(metrics['loss_total']):.4f}"
                )
                t_last = _time.time()
            t_step += _time.perf_counter() - t_mark
            t_mark = _time.perf_counter()
        if n_steps:
            # t_step includes t_data (async dispatch hides device time until
            # the next blocking transfer); block on the last metric to charge
            # the tail to the step bucket
            jax.block_until_ready(metrics["loss_total"])
            acc.add({"data_s_per_step": t_data / n_steps,
                     "step_s_per_step": t_step / n_steps})

        record = run_logger.append(epoch, acc.means())
        logger.info(f"epoch {epoch}: {record}")

        if epoch % cfg.save_epoch_interval == 0:
            save_checkpoint(run_dir, state, epoch)

        # also fire on the final epoch so the logged curve ends at the
        # shipped checkpoint (a 20-epoch run with interval 30 would
        # otherwise only record the untrained epoch-0 point)
        if eval_callback is not None and (
                epoch % cfg.test_epoch_interval == 0
                or epoch == tcfg.n_epochs - 1):
            test_metrics = eval_callback(state, epoch)
            if test_metrics:
                run_logger.append(
                    epoch, {},
                    extra={f"test/{k}": v for k, v in test_metrics.items()},
                )

        if val_ds is not None and epoch % cfg.val_epoch_interval == 0:
            # validation = the train loss path without the update
            # (ref: train_pose.py:341-349 validation epoch)
            val_sampler = PartialSampler(
                val_ds, max(global_batch, tcfg.epoch_size // 10), seed=0
            )
            val_loader = PrefetchLoader(
                val_ds, val_sampler, global_batch, PoseDataset.collate_fn,
                n_workers=max(cfg.n_dataloader_workers, 1),
            )
            val_acc = MetricsAccumulator()
            for batch in val_loader:
                rng, step_rng = jax.random.split(rng)
                device_batch = dict(
                    images=batch.images,  # uint8; float conversion on device
                    K=batch.K,
                    TCO=batch.TCO,
                    bboxes=batch.bboxes,
                    label_ids=np.asarray(mesh_db.ids_for(batch.labels), np.int32),
                )
                if mesh is not None:
                    device_batch = shard_batch(mesh, device_batch)
                val_metrics = val_fn(state, device_batch, step_rng)
                val_acc.add(val_metrics)
            run_logger.append(
                epoch, {}, extra={f"val/{k}": v for k, v in val_acc.means().items()}
            )

    stop_trace()
    save_checkpoint(run_dir, state, tcfg.n_epochs - 1)
    return state, run_dir
