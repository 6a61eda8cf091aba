"""End-to-end CLI test: the runner main() on a tiny synthetic stream."""

import json
import os

from icpslam_tpu.io import runner


class TestRunnerCLI:
    def test_synthetic_run_and_export(self, tmp_path, capsys):
        out = os.path.join(tmp_path, "traj.npz")
        rc = runner.main(
            [
                "--synthetic",
                "--poses", "8",
                "--voxel", "0.3",
                "--map-resolution", "0.3",
                "--max-points", "512",
                "--max-raw-points", "4096",
                "--max-map-points", "4096",
                "--max-keyframes", "16",
                "--keyframe-distance", "0.5",
                "--verbosity", "0",
                "--out", out,
            ]
        )
        assert rc == 0
        captured = capsys.readouterr().out.strip().splitlines()
        summary = json.loads(captured[-1])
        assert summary["scans"] == 8
        assert summary["keyframes"] >= 1
        assert "ate_m" in summary
        assert os.path.exists(out)
        import numpy as np

        data = np.load(out)
        assert data["t"].shape == (8, 3)
        assert data["gt_t"].shape == (8, 3)

    def test_save_state_and_resume(self, tmp_path, capsys):
        """CLI checkpoint round-trip: --save-state then --resume continues
        with the restored keyframes (SURVEY §5.4 via the entry layer)."""
        ckpt = os.path.join(tmp_path, "state.npz")
        common = [
            "--synthetic", "--poses", "6", "--voxel", "0.3",
            "--map-resolution", "0.3", "--max-points", "512",
            "--max-raw-points", "4096", "--max-map-points", "4096",
            "--max-keyframes", "16", "--keyframe-distance", "0.5",
            "--verbosity", "0",
        ]
        rc = runner.main(common + ["--save-state", ckpt])
        assert rc == 0
        first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert os.path.exists(ckpt)

        rc = runner.main(common + ["--resume", ckpt])
        assert rc == 0
        second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # resumed run starts from the checkpointed keyframes (the final
        # map_size may legitimately be 0 right after an optimize-reset)
        assert second["keyframes"] >= first["keyframes"] >= 1
        assert second["scans"] == 6


class TestRunnerDebugProducts:
    def test_debug_dump_and_live_viewer(self, tmp_path, capsys):
        """--debug-dump writes failing-scan products and --html-every
        refreshes the viewer during the run (reference debug topics /
        live rviz analogs, VERDICT r2 item 10 / missing #2)."""
        import glob

        dump = os.path.join(tmp_path, "dbg")
        html = os.path.join(tmp_path, "live.html")
        rc = runner.main([
            "--synthetic", "--poses", "6", "--voxel", "0.3",
            "--map-resolution", "0.3", "--max-points", "512",
            "--max-raw-points", "4096", "--max-map-points", "4096",
            "--max-keyframes", "16", "--keyframe-distance", "0.5",
            "--verbosity", "0",
            "--debug-dump", dump, "--html", html, "--html-every", "3",
        ])
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # compile excluded from the step stats, reported separately
        assert summary["compile_ms"] > 0
        if "step_ms_mean" in summary:
            assert summary["step_ms_mean"] < summary["compile_ms"]
        # live viewer refreshed in-run (and finalized at the end)
        assert os.path.exists(html)
        # any dumps that were written carry the full product schema
        import numpy as np

        for f in glob.glob(os.path.join(dump, "*.npz")):
            d = np.load(f)
            for key in ("filtered_points", "pose_map_t", "nn_points", "fitness"):
                assert key in d, (f, key)


class TestPackedRecordPath:
    """The r5 streaming bookkeeping (SlamOutput.packed accumulated
    on-device, one fetch per block) must report exactly what the
    synchronous per-scan path reports — records AND trajectory."""

    def test_async_packed_matches_sync_records(self):
        import jax
        import numpy as np

        from icpslam_tpu.config import IcpConfig, tiny_config
        from icpslam_tpu.geometry import se3
        from icpslam_tpu.io import synthetic
        from icpslam_tpu.io.runner import run_slam

        cfg = tiny_config(
            voxel_leaf_size=0.3,
            map_resolution=0.3,
            icp_odometry=IcpConfig(mode="point", max_iterations=8),
            icp_mapping=IcpConfig(mode="point", max_iterations=8),
            max_points=512,
            max_raw_points=2048,
            max_map_points=4096,
            max_keyframes=16,
            max_edges=64,
        )
        world = synthetic.make_room_world(seed=0, n_points=8000)
        gt = synthetic.make_loop_trajectory(n_poses=9, radius=5.0, laps=0.4)

        def scans():
            return list(synthetic.scan_stream(
                world, gt, capacity=2048, n_points=800, seed=0
            ))

        res_async = run_slam(scans(), cfg, initial_pose=se3.index(gt, 0))
        res_sync = run_slam(
            scans(), cfg.replace(verbosity=2), initial_pose=se3.index(gt, 0)
        )
        assert len(res_async.per_scan) == len(res_sync.per_scan) == 9
        for ra, rs in zip(res_async.per_scan, res_sync.per_scan):
            for k in ("accepted", "refined", "new_keyframe", "loop_closure",
                      "optimized", "map_size", "num_keyframes",
                      "correspondences", "icp_iterations"):
                assert ra[k] == rs[k], (k, ra, rs)
            # bootstrap scans legitimately report inf fitness in both modes
            if np.isfinite(ra["fitness"]) or np.isfinite(rs["fitness"]):
                assert abs(ra["fitness"] - rs["fitness"]) < 1e-5
        np.testing.assert_allclose(
            np.asarray(res_async.trajectory.t),
            np.asarray(res_sync.trajectory.t), atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(res_async.trajectory.q),
            np.asarray(res_sync.trajectory.q), atol=1e-6,
        )
        # wall accounting reconciles in both modes
        for res in (res_async, res_sync):
            ws = res.timing_summary().get("wall_vs_step")
            assert ws is not None and ws["wall_s"] > 0
