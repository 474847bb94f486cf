"""Global paths and environment configuration.

Capability match for the reference's ``cosypose/config.py``: a single place for
the data/experiment/result directories. Unlike the reference (which hard-requires
a conda env and an existing local_data directory, ref: config.py:33,45), paths
default lazily and are overridable via environment variables:

    COSYPOSE_TPU_DATA_DIR    datasets root (default ./local_data)
    COSYPOSE_TPU_EXP_DIR     training runs (default <data>/experiments)
    COSYPOSE_TPU_RESULTS_DIR results (default <data>/results)
"""

from __future__ import annotations

import os
import pathlib

PROJECT_ROOT = pathlib.Path(__file__).resolve().parent.parent

LOCAL_DATA_DIR = pathlib.Path(
    os.environ.get("COSYPOSE_TPU_DATA_DIR", PROJECT_ROOT / "local_data")
)
EXP_DIR = pathlib.Path(
    os.environ.get("COSYPOSE_TPU_EXP_DIR", LOCAL_DATA_DIR / "experiments")
)
RESULTS_DIR = pathlib.Path(
    os.environ.get("COSYPOSE_TPU_RESULTS_DIR", LOCAL_DATA_DIR / "results")
)
DEBUG_DATA_DIR = pathlib.Path(
    os.environ.get("COSYPOSE_TPU_DEBUG_DIR", LOCAL_DATA_DIR / "debug_data")
)
