"""ctypes bindings for the native scan loader (``native/scanio.cpp``).

The C++ library does buffered .bin reading, range gating, deterministic
subsampling, and multi-threaded prefetch through a bounded in-order ring
buffer — keeping the device fed without Python file IO in the loop.

``available()`` reports whether the shared library exists (it is built on
demand with ``make -C native``); every entry point has a pure-Python
fallback (``io.kitti``) so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Sequence

import numpy as np

from icpslam_tpu.cloud import pointcloud as pc

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libscanio.so"))
_lib = None


def _load(build: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.scanio_read_bin.restype = ctypes.c_int
    lib.scanio_read_bin.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float,
    ]
    lib.scanio_prefetcher_create.restype = ctypes.c_void_p
    lib.scanio_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.scanio_prefetcher_next.restype = ctypes.c_int
    lib.scanio_prefetcher_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
    ]
    lib.scanio_prefetcher_destroy.restype = None
    lib.scanio_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_scan(
    path: str,
    capacity: int,
    record_stride: int = 4,
    min_range: float = 2.5,
    max_range: float = 80.0,
) -> pc.PointCloud:
    """Read one scan natively into a padded PointCloud."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native scanio library unavailable")
    buf = np.zeros((capacity, 3), np.float32)
    n = lib.scanio_read_bin(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        capacity, record_stride, min_range, max_range,
    )
    if n < 0:
        raise IOError(f"native read failed for {path}")
    mask = np.zeros((capacity,), bool)
    mask[:n] = True
    import jax.numpy as jnp

    return pc.PointCloud(points=jnp.asarray(buf), mask=jnp.asarray(mask))


class PrefetchingLoader:
    """Iterate padded scans with native read-ahead (N threads, bounded,
    in-order delivery)."""

    def __init__(
        self,
        paths: Sequence[str],
        capacity: int,
        record_stride: int = 4,
        min_range: float = 2.5,
        max_range: float = 80.0,
        threads: int = 2,
        depth: int = 4,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native scanio library unavailable")
        self._lib = lib
        self._capacity = capacity
        self._n = len(paths)
        self._encoded = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * self._n)(*self._encoded)
        self._handle = lib.scanio_prefetcher_create(
            arr, self._n, capacity, record_stride,
            ctypes.c_float(min_range), ctypes.c_float(max_range),
            threads, depth,
        )
        if not self._handle:
            raise RuntimeError("failed to create native prefetcher")

    def __iter__(self) -> Iterator[pc.PointCloud]:
        import jax.numpy as jnp

        buf = np.zeros((self._capacity, 3), np.float32)
        for k in range(self._n):
            n = self._lib.scanio_prefetcher_next(
                self._handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
            if n == -2:
                break
            if n < 0:
                # match the Python reader's behavior: a bad file is an
                # error, not a silent empty scan
                raise IOError(f"native read failed for scan #{k}")
            mask = np.zeros((self._capacity,), bool)
            mask[:n] = True
            yield pc.PointCloud(
                points=jnp.asarray(buf.copy()), mask=jnp.asarray(mask)
            )

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.scanio_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        self.close()


def scan_stream(
    root: str, seq: str, capacity: int, threads: int = 2, depth: int = 4,
    start: int = 0, end: Optional[int] = None, with_stamps: bool = False,
):
    """Native prefetching KITTI stream; falls back to the Python reader
    when the toolchain/library is unavailable. With ``with_stamps`` yields
    ``(cloud, stamp)`` pairs using sequences/<seq>/times.txt."""
    from icpslam_tpu.io import kitti

    files: List[str] = kitti.scan_files(root, seq)[start:end]
    stamps = None
    if with_stamps:
        try:
            stamps = kitti.read_times(root, seq)[start:end]
        except (FileNotFoundError, OSError):
            stamps = np.arange(start, start + len(files), dtype=np.float64) * 0.1
        stamps = kitti._pad_stamps(stamps, len(files))
    if available():
        it = iter(PrefetchingLoader(files, capacity, threads=threads, depth=depth))
    else:
        it = (
            pc.from_points(
                kitti.read_scan(f, max_points=capacity, seed=i), capacity=capacity
            )
            for i, f in enumerate(files)
        )
    for i, cloud in enumerate(it):
        yield (cloud, float(stamps[i])) if with_stamps else cloud
