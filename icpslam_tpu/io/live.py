"""Live scan ingest: consume velodyne-format ``.bin`` files as they
appear in a directory.

The reference is fed by a live ROS topic
(``/root/reference/src/icpslam/icp_odometer.cpp:147`` laser callback);
this framework's transport-free analog is a watched spool directory — a
producer (sensor daemon, rosbag bridge, another process) drops files,
the host loop consumes them in order and feeds the jitted pipeline
(SURVEY §5.8: "an optional thin adapter for streaming scans in from
files/sockets"). No middleware; back-pressure is the filesystem.

Producer contract: write to a temp name and ``rename`` into place
(atomic on POSIX) — files ending in ``.tmp`` / ``.part`` are ignored.
Stream end: drop a ``STOP`` file, or stay silent for ``idle_timeout``
seconds.

    python -m icpslam_tpu.io.runner --watch /var/spool/scans
"""

from __future__ import annotations

import os
import time
from typing import Iterator, Optional, Tuple

import numpy as np

from icpslam_tpu.cloud import pointcloud as pc

_SKIP_SUFFIXES = (".tmp", ".part")
STOP_FILE = "STOP"


def _stamp_of(path: str) -> float:
    """Sensor stamp: ``<seconds>.bin`` filename when parseable (the
    producer's timestamp), else file mtime."""
    base = os.path.splitext(os.path.basename(path))[0]
    try:
        return float(base)
    except ValueError:
        return os.path.getmtime(path)


def directory_stream(
    path: str,
    capacity: int,
    poll_interval: float = 0.05,
    idle_timeout: float = 30.0,
    with_stamps: bool = True,
    min_range: float = 2.5,
    max_range: float = 80.0,
    use_native: Optional[bool] = None,
) -> Iterator:
    """Yield padded scans (or ``(cloud, stamp)`` pairs) from ``path`` as
    files arrive, in sorted filename order. Ends on a ``STOP`` file (after
    draining everything before it) or after ``idle_timeout`` seconds with
    no new files.
    """
    from icpslam_tpu.io import kitti, native_loader

    if use_native is None:
        use_native = native_loader.available()
    seen = set()
    last_new = time.monotonic()
    while True:
        try:
            entries = sorted(os.listdir(path))
        except FileNotFoundError:
            entries = []
        stop = STOP_FILE in entries
        new = [
            f for f in entries
            if f.endswith(".bin") and not f.endswith(_SKIP_SUFFIXES)
            and f not in seen
        ]
        for f in new:
            seen.add(f)
            full = os.path.join(path, f)
            if use_native:
                cloud = native_loader.read_scan(
                    full, capacity, min_range=min_range, max_range=max_range
                )
            else:
                cloud = pc.from_points(
                    kitti.read_scan(
                        full, max_points=capacity,
                        min_range=min_range, max_range=max_range,
                    ),
                    capacity=capacity,
                )
            last_new = time.monotonic()
            yield (cloud, _stamp_of(full)) if with_stamps else cloud
        if stop and not new:
            return  # everything before the STOP marker is drained
        if not new:
            if time.monotonic() - last_new > idle_timeout:
                return
            time.sleep(poll_interval)
