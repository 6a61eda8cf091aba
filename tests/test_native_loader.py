"""Native scan loader: build, read correctness vs numpy, prefetcher order."""

import os

import numpy as np
import pytest

from icpslam_tpu.cloud import pointcloud as pc
from icpslam_tpu.io import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native toolchain unavailable"
)


def write_bin(path, pts4):
    np.asarray(pts4, np.float32).tofile(path)


@pytest.fixture()
def scan_file(tmp_path):
    rng = np.random.RandomState(0)
    n = 500
    pts = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    refl = rng.rand(n, 1).astype(np.float32)
    path = os.path.join(tmp_path, "000000.bin")
    write_bin(path, np.hstack([pts, refl]))
    return path, pts


class TestNativeRead:
    def test_matches_numpy_filter(self, scan_file):
        path, pts = scan_file
        cloud = native_loader.read_scan(path, capacity=1024, min_range=2.5, max_range=25.0)
        got = pc.to_numpy(cloud)
        r = np.linalg.norm(pts, axis=-1)
        expect = pts[(r >= 2.5) & (r <= 25.0)]
        assert got.shape == expect.shape
        # native keeps original order when no subsampling is needed
        np.testing.assert_allclose(got, expect, atol=1e-6)

    def test_subsample_to_capacity(self, scan_file):
        path, pts = scan_file
        cloud = native_loader.read_scan(path, capacity=64, min_range=0.0, max_range=1e9)
        assert int(cloud.count()) == 64

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(IOError):
            native_loader.read_scan(os.path.join(tmp_path, "nope.bin"), capacity=64)


class TestPrefetcher:
    def test_in_order_delivery(self, tmp_path):
        rng = np.random.RandomState(1)
        paths = []
        markers = []
        for i in range(12):
            # distinguishable first point per file
            pts = rng.uniform(5, 20, (100, 3)).astype(np.float32)
            pts[0] = [10.0 + i, 0.0, 0.0]
            refl = np.zeros((100, 1), np.float32)
            p = os.path.join(tmp_path, f"{i:06d}.bin")
            write_bin(p, np.hstack([pts, refl]))
            paths.append(p)
            markers.append(10.0 + i)
        loader = native_loader.PrefetchingLoader(
            paths, capacity=128, min_range=0.0, max_range=1e9, threads=3, depth=2
        )
        seen = []
        for cloud in loader:
            seen.append(float(np.asarray(cloud.points)[0, 0]))
        loader.close()
        assert seen == markers  # strict file order despite 3 worker threads

    def test_counts(self, tmp_path):
        pts = np.ones((10, 4), np.float32) * 5.0
        p = os.path.join(tmp_path, "a.bin")
        write_bin(p, pts)
        loader = native_loader.PrefetchingLoader(
            [p], capacity=32, min_range=0.0, max_range=1e9
        )
        clouds = list(loader)
        assert len(clouds) == 1
        assert int(clouds[0].count()) == 10
