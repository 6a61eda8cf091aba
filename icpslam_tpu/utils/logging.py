"""Leveled logger — the reference's ``verbosity_level_`` mechanism
(SURVEY.md §5.5) without the ROS dependency, and with the key-name
inconsistency (``verbosity_level_`` vs ``verbosity_level``,
``icp_odometer.cpp:37`` vs ``octree_mapper.cpp:33``) made moot by a single
typed config field."""

from __future__ import annotations

import sys
import time


class Logger:
    """level 0 = silent, 1 = info/warn, 2 = debug (reference's dump level)."""

    def __init__(self, level: int = 1, stream=None, name: str = "icpslam"):
        self.level = level
        self.stream = stream or sys.stderr
        self.name = name
        self._t0 = time.perf_counter()

    def _emit(self, tag: str, msg: str) -> None:
        dt = time.perf_counter() - self._t0
        print(f"[{self.name} {dt:8.2f}s {tag}] {msg}", file=self.stream)

    def info(self, msg: str) -> None:
        if self.level >= 1:
            self._emit("INFO", msg)

    def warn(self, msg: str) -> None:
        if self.level >= 1:
            self._emit("WARN", msg)

    def debug(self, msg: str) -> None:
        if self.level >= 2:
            self._emit("DEBUG", msg)
