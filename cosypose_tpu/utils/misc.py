"""Small cross-cutting utilities.

Capability match for the reference's ``cosypose/utils/{random,resources,tqdm}.py``.
"""

from __future__ import annotations

import contextlib

import numpy as np


@contextlib.contextmanager
def temp_numpy_seed(seed):
    """Temporarily seed numpy's global RNG (ref: utils/random.py:1-11)."""
    state = np.random.get_state()
    np.random.seed(seed)
    try:
        yield
    finally:
        np.random.set_state(state)


def get_total_memory_mb() -> float:
    """Current process RSS in MB (ref: utils/resources.py RSS probe)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def assign_gpu():
    """The reference pins CUDA_VISIBLE_DEVICES per process
    (ref: utils/resources.py); under JAX the runtime owns device assignment —
    kept as an explicit no-op for API parity."""
    return None


def patch_tqdm():
    """The reference redirects tqdm to stdout (ref: utils/tqdm.py:1-9); this
    build logs progress through utils.logging instead."""
    return None
