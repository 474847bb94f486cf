"""Multi-host distributed initialization + helpers.

Capability match for the reference's ``cosypose/utils/distributed.py`` —
redesigned for JAX's single-controller SPMD model: no NCCL process groups, no
file-based rendezvous, no SLURM env parsing (ref: distributed.py:55-69). On a
multi-host TPU pod, each host calls init_distributed_mode() once
(jax.distributed.initialize auto-discovers the coordinator on TPU); within a
host, all local chips are already visible. Collectives ride ICI via XLA; there
is no explicit all-reduce API to call (shardings insert them).
"""

from __future__ import annotations

import jax
import numpy as np

from .logging import get_logger

logger = get_logger(__name__)

_initialized = False


def init_distributed_mode(coordinator_address: str | None = None,
                          num_processes: int | None = None,
                          process_id: int | None = None):
    """Initialize multi-host JAX. Safe no-op on a single host
    (mirrors the reference's degenerate world_size=1 path, ref: :39-52)."""
    global _initialized
    if _initialized:
        return
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif jax.process_count() == 1 and num_processes not in (None, 1):
            jax.distributed.initialize()
        _initialized = True
    except Exception as e:  # single-host: nothing to initialize
        logger.info(f"single-host mode ({e})")
        _initialized = True


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def get_tmp_dir():
    """Shared scratch dir for host-side result exchange (the reference's
    file-gather fallback, ref: tensor_collection.py:142-163)."""
    import os
    import pathlib

    d = pathlib.Path(os.environ.get("COSYPOSE_TPU_TMP", "/tmp/cosypose_tpu"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def reduce_dict(metrics: dict, average: bool = True) -> dict:
    """Average/sum a metrics dict across hosts (ref: distributed.py:72-98).

    Under jit DP the step metrics are already globally reduced by XLA; this
    host-level version covers host-side counters (e.g. eval bookkeeping).
    """
    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(metrics.keys())
    vec = np.asarray([float(metrics[k]) for k in keys], np.float32)
    summed = multihost_utils.process_allgather(vec).sum(axis=0)
    if average:
        summed = summed / jax.process_count()
    return {k: float(v) for k, v in zip(keys, summed)}
