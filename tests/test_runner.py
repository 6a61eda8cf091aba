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
