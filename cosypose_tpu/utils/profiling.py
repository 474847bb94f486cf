"""Profiling surface: XLA/TPU trace capture + stage timers.

SURVEY §5.1 rebuild note: the reference relies on CUDA-side profiling
(torch.autograd profiler / nvprof conventions); the TPU-native equivalents
are ``jax.profiler`` traces (viewable in TensorBoard / Perfetto) plus the
host-side stage timers (utils/timer.py). Two entry points:

  with trace("/tmp/traces"):            # capture one region
      run_step()

  COSYPOSE_TPU_TRACE_DIR=/tmp/traces python -m cosypose_tpu.scripts...
      → training/eval CLIs call `maybe_start_trace()` / `stop_trace()`
        around their main loop when the env var is set.
"""

from __future__ import annotations

import contextlib
import os

import jax

from .logging import get_logger

logger = get_logger(__name__)

_ENV_VAR = "COSYPOSE_TPU_TRACE_DIR"
_active = {"dir": None}


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed region."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {log_dir}")


def annotate(name: str):
    """Named sub-region inside an active trace (shows up on the timeline)."""
    return jax.profiler.TraceAnnotation(name)


def maybe_start_trace():
    """Start a trace iff COSYPOSE_TPU_TRACE_DIR is set (CLI hook)."""
    log_dir = os.environ.get(_ENV_VAR)
    if log_dir and _active["dir"] is None:
        jax.profiler.start_trace(log_dir)
        _active["dir"] = log_dir
        logger.info(f"profiler tracing to {log_dir} (env {_ENV_VAR})")


def stop_trace():
    if _active["dir"] is not None:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {_active['dir']}")
        _active["dir"] = None
