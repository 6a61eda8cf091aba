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
