"""Elapsed-time console logging (capability match for cosypose/utils/logging.py)."""

from __future__ import annotations

import logging
import time

_START = time.time()


class _ElapsedFormatter(logging.Formatter):
    def format(self, record):
        elapsed = time.time() - _START
        record.elapsed = f"{int(elapsed // 60):02d}:{elapsed % 60:06.3f}"
        return super().format(record)


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            _ElapsedFormatter("[%(elapsed)s] %(name)s %(levelname)s: %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger
