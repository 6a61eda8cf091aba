"""Real-KITTI code path end-to-end without the dataset (VERDICT r2 item 6):
the proxy writes a full on-disk KITTI odometry tree — 4-column velodyne
.bins, a NON-trivial ``Tr`` in calib.txt, irregular times.txt, cam0-frame
poses/ — and the runner's ``--kitti`` path (native prefetching loader +
``Tr⁻¹·T·Tr`` ground-truth conversion, ``io/kitti.py``) must drive it to a
small ATE.
"""

import json
import os

import numpy as np
import pytest

from icpslam_tpu import config as config_mod
from icpslam_tpu.config import kitti_config
from icpslam_tpu.geometry import se3
from icpslam_tpu.io import kitti, native_loader, synthetic


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_root"))
    world = synthetic.make_urban_world(
        seed=3, blocks=2, block_size=60.0,
        ground_density=1.5, wall_density=5.0, n_poles=80,
    )
    gt = synthetic.make_urban_drive(n_poses=25, blocks=2, block_size=60.0, speed=8.0)
    t_np, q_np = np.asarray(gt.t), np.asarray(gt.q)
    scans = [
        synthetic.render_velodyne_scan(
            world, t_np[i], q_np[i], seed=3 + i, azimuth_bins=1024,
            max_points=16384,
        )
        for i in range(25)
    ]
    kitti.write_tree(root, "99", scans, gt)
    return root, gt


class TestKittiTree:
    def test_tree_layout_and_formats(self, kitti_tree):
        root, gt = kitti_tree
        seq_dir = os.path.join(root, "sequences", "99")
        bins = sorted(os.listdir(os.path.join(seq_dir, "velodyne")))
        assert len(bins) == 25 and bins[0] == "000000.bin"
        raw = np.fromfile(
            os.path.join(seq_dir, "velodyne", bins[0]), dtype=np.float32
        )
        assert raw.shape[0] % 4 == 0  # 4-column records
        stamps = np.loadtxt(os.path.join(seq_dir, "times.txt"))
        assert stamps.shape[0] == 25
        assert (np.diff(stamps) > 0).all()
        # irregular (jittered), not an exact 10 Hz counter
        assert np.std(np.diff(stamps)) > 1e-4
        # Tr is genuinely non-trivial (a rotation, not identity)
        tr = kitti.read_calib(seq_dir)
        assert not np.allclose(tr[:3, :3], np.eye(3))
        assert np.allclose(tr[:3, :3] @ tr[:3, :3].T, np.eye(3), atol=1e-9)

    def test_ground_truth_round_trips_through_tr(self, kitti_tree):
        """poses/ are cam0-frame; the loader's ``Tr⁻¹·T·Tr`` conversion
        (``kitti.py``) must recover the original velodyne trajectory."""
        root, gt = kitti_tree
        back = kitti.ground_truth_velodyne(root, "99")
        np.testing.assert_allclose(
            np.asarray(back.t), np.asarray(gt.t), atol=1e-3
        )
        # quaternions up to sign
        qa, qb = np.asarray(back.q), np.asarray(gt.q)
        dot = np.abs(np.sum(qa * qb, axis=-1))
        assert (dot > 1 - 1e-5).all()

    def test_native_loader_reads_four_column_bins(self, kitti_tree):
        root, _ = kitti_tree
        if not native_loader.available():
            pytest.skip("native toolchain unavailable")
        f = kitti.scan_files(root, "99")[0]
        native = native_loader.read_scan(f, capacity=16384)
        n_native = int(np.asarray(native.mask).sum())
        py = kitti.read_scan(f, max_points=16384)
        assert n_native == py.shape[0]
        np.testing.assert_allclose(
            np.asarray(native.points)[:n_native], py, atol=1e-6
        )

    def test_runner_kitti_end_to_end(self, kitti_tree, tmp_path):
        """The full ``runner --kitti`` path: native prefetch loader,
        times.txt stamps, Tr ground-truth conversion, ATE in the summary."""
        from icpslam_tpu.io import runner

        root, _ = kitti_tree
        cfg_yaml = str(tmp_path / "cfg.yaml")
        config_mod.save_yaml(
            kitti_config(
                max_points=2048, max_raw_points=16384,
                max_map_points=65536, max_keyframes=64, max_edges=256,
                voxel_leaf_size=0.6, map_resolution=0.6,
            ),
            cfg_yaml,
        )
        summary_path = str(tmp_path / "summary.json")
        rc = runner.main([
            "--kitti", root, "--seq", "99", "--config", cfg_yaml,
            "--summary-out", summary_path, "--cpu",
        ])
        assert rc == 0
        with open(summary_path) as f:
            summary = json.load(f)
        assert summary["scans"] == 25
        assert summary["keyframes"] >= 5
        # idealized render at urban scale: tracking must be tight; 0.2 m
        # bound = broken Tr conversion / loader detector (a frame mixup
        # shows up as meters)
        assert summary["ate_m"] < 0.2, summary
