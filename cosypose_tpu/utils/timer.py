"""Pause/resume wall timer used to split pipeline stage times.

(capability match for cosypose/utils/timer.py — used to profile the RANSAC and
BA stages, ref: multiview/ransac.py:144-197, bundle_adjustment.py:322-350)
"""

from __future__ import annotations

import datetime
import time


class Timer:
    def __init__(self):
        self.start_time = None
        self.elapsed = 0.0
        self.is_running = False

    def reset(self):
        self.start_time = None
        self.elapsed = 0.0
        self.is_running = False
        return self

    def start(self):
        self.elapsed = 0.0
        self.resume()
        return self

    def pause(self):
        if self.is_running:
            self.elapsed += time.time() - self.start_time
            self.is_running = False
        return self

    def resume(self):
        self.is_running = True
        self.start_time = time.time()
        return self

    def stop(self):
        self.pause()
        return datetime.timedelta(seconds=self.elapsed)
