"""KITTI loader tests against a fabricated dataset tree (no real data in
CI): .bin parsing, calib/poses plumbing, velodyne-frame ground truth."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from icpslam_tpu.cloud import pointcloud as pcl
from icpslam_tpu.geometry import se3
from icpslam_tpu.io import kitti


@pytest.fixture()
def kitti_root(tmp_path):
    root = str(tmp_path)
    seq_dir = os.path.join(root, "sequences", "04")
    velo_dir = os.path.join(seq_dir, "velodyne")
    os.makedirs(velo_dir)
    os.makedirs(os.path.join(root, "poses"))

    rng = np.random.RandomState(0)
    n_frames, n_pts = 4, 200
    for k in range(n_frames):
        pts = rng.uniform(-20, 20, (n_pts, 3)).astype(np.float32)
        refl = rng.rand(n_pts, 1).astype(np.float32)
        np.hstack([pts, refl]).tofile(os.path.join(velo_dir, f"{k:06d}.bin"))

    # calib: Tr = velo->cam0 with a 90° yaw + offset
    c, s = np.cos(0.3), np.sin(0.3)
    tr = np.array([[c, -s, 0, 0.1], [s, c, 0, -0.2], [0, 0, 1, 0.8]])
    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        for name in ("P0", "P1", "P2", "P3"):
            f.write(f"{name}: " + " ".join(["0"] * 12) + "\n")
        f.write("Tr: " + " ".join(str(v) for v in tr.ravel()) + "\n")

    # poses: straight line in cam frame
    with open(os.path.join(root, "poses", "04.txt"), "w") as f:
        for k in range(n_frames):
            m = np.eye(4)[:3]
            m[0, 3] = 2.0 * k
            f.write(" ".join(str(v) for v in m.ravel()) + "\n")
    return root


class TestKittiLoader:
    def test_read_scan_filters_range(self, kitti_root):
        files = kitti.scan_files(kitti_root, "04")
        assert len(files) == 4
        pts = kitti.read_scan(files[0], min_range=5.0, max_range=25.0)
        r = np.linalg.norm(pts, axis=-1)
        assert pts.shape[1] == 3
        assert r.min() >= 5.0 and r.max() <= 25.0

    def test_scan_stream_padded(self, kitti_root):
        scans = list(kitti.scan_stream(kitti_root, "04", capacity=256))
        assert len(scans) == 4
        for s in scans:
            assert s.capacity == 256
            assert 0 < int(s.count()) <= 256

    def test_calib_parse(self, kitti_root):
        tr = kitti.read_calib(os.path.join(kitti_root, "sequences", "04"))
        assert tr.shape == (4, 4)
        np.testing.assert_allclose(tr[3], [0, 0, 0, 1])
        np.testing.assert_allclose(tr[0, 3], 0.1)

    def test_ground_truth_velodyne_frame(self, kitti_root):
        gt = kitti.ground_truth_velodyne(kitti_root, "04")
        assert gt.t.shape == (4, 3)
        # first pose is identity (world anchored at frame 0 velo)
        np.testing.assert_allclose(np.asarray(gt.t[0]), 0.0, atol=1e-5)
        # camera moves +x(cam) 2m/frame; velodyne-frame motion has the
        # same per-frame displacement magnitude (rigid conjugation)
        step = np.asarray(se3.relative(se3.index(gt, 0), se3.index(gt, 1)).t)
        np.testing.assert_allclose(np.linalg.norm(step), 2.0, atol=1e-4)

    def test_find_dataset_none(self, tmp_path):
        assert kitti.find_dataset(candidates=(str(tmp_path),)) is None

    def test_native_matches_python_reader(self, kitti_root):
        from icpslam_tpu.io import native_loader

        if not native_loader.available():
            pytest.skip("native toolchain unavailable")
        files = kitti.scan_files(kitti_root, "04")
        py = kitti.read_scan(files[0], min_range=2.5, max_range=80.0)
        nat = pcl.to_numpy(
            native_loader.read_scan(files[0], capacity=512, min_range=2.5, max_range=80.0)
        )
        # same filter criteria → same surviving set (order preserved)
        assert nat.shape == py.shape
        np.testing.assert_allclose(np.sort(nat, axis=0), np.sort(py, axis=0), atol=1e-6)
