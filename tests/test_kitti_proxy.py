"""KITTI-proxy regression: the urban-scale synthetic workload (64-beam
occlusion-correct velodyne scans, city-block world, 10 Hz drive) through
the full pipeline at the kitti_config operating point — the VERDICT r1
stand-in for real KITTI (no dataset on this machine). Calibrated output
at this seed/config: ATE ≈ 0.025 m over 45 scans (36 m of driving)."""

import jax
import numpy as np

from icpslam_tpu.config import kitti_config
from icpslam_tpu.eval import metrics
from icpslam_tpu.geometry import se3
from icpslam_tpu.io import synthetic
from icpslam_tpu.pipeline import slam


def proxy_cfg():
    return kitti_config(
        max_points=2048,
        max_raw_points=16384,
        max_map_points=65536,
        max_keyframes=64,
        max_edges=256,
        voxel_leaf_size=0.6,
        map_resolution=0.6,
    )


class TestKittiProxy:
    def test_velodyne_renderer_occludes(self):
        """A wall must hide what is behind it: points beyond the first
        facade along a ray should not survive the z-buffer."""
        world = synthetic.make_urban_world(seed=1, blocks=2, block_size=60.0)
        gt = synthetic.make_urban_drive(n_poses=4, blocks=2, block_size=60.0)
        pts = synthetic.render_velodyne_scan(
            world, np.asarray(gt.t[0]), np.asarray(gt.q[0]), seed=1
        )
        assert pts.shape[0] > 2000
        r = np.linalg.norm(pts, axis=-1)
        # range gate is pre-noise; Gaussian range noise can nudge past it
        assert (r >= 2.4).all() and (r <= 81.0).all()
        # beam structure: elevations quantized to at most n_beams rings
        el = np.degrees(np.arcsin(np.clip(pts[:, 2] / np.maximum(r, 1e-9), -1, 1)))
        assert el.min() >= -25.0 and el.max() <= 2.5

    def test_urban_drive_closes_loop(self):
        # one lap of the first block is ~390 m; the route must return to
        # its start for the loop-closure workload
        gt = synthetic.make_urban_drive(n_poses=500, speed=8.0)
        d_start = np.linalg.norm(np.asarray(gt.t[-1] - gt.t[0])[:2])
        total = float(
            np.sum(np.linalg.norm(np.diff(np.asarray(gt.t), axis=0), axis=-1))
        )
        assert total > 350.0
        assert d_start < 30.0  # back near the start after ~1 lap

    def test_pipeline_tracks_urban_sequence(self):
        cfg = proxy_cfg()
        world = synthetic.make_urban_world(
            seed=3, blocks=2, block_size=60.0,
            ground_density=1.5, wall_density=5.0, n_poles=80,
        )
        gt = synthetic.make_urban_drive(
            n_poses=45, blocks=2, block_size=60.0, speed=8.0
        )
        step = jax.jit(slam.slam_step, static_argnums=(2,))
        state = slam.init_state(cfg, initial_pose=se3.index(gt, 0))
        poses = []
        for scan, ts in synthetic.velodyne_stream(
            world, gt, capacity=cfg.max_raw_points, azimuth_bins=1024, seed=3
        ):
            state, out = step(state, scan, cfg, ts)
            poses.append(out.pose_map)
        est = se3.stack(poses)
        ate, _ = metrics.ate(est, gt, align=False)
        # calibrated 0.0246 m; 0.15 m bound = broken-tracking detector at
        # urban scale (inter-scan motion 0.8 m, 60+ m streets)
        assert float(ate) < 0.15, float(ate)
        assert int(state.keyframes.count) >= 10
        assert int(state.num_optimizations) >= 2
        assert int(state.map.overflow) == 0
        # real 10 Hz stamps propagated into the keyframe store
        n = int(state.keyframes.count)
        st = np.asarray(state.keyframes.stamp)[:n]
        assert (np.diff(st) > 0).all()
        assert st.max() <= 4.5  # 45 scans at 10 Hz

    def _physics_run(self, deskew: bool):
        cfg = proxy_cfg()
        world = synthetic.make_urban_world(
            seed=3, blocks=2, block_size=60.0,
            ground_density=1.5, wall_density=5.0, n_poles=80,
        )
        gt = synthetic.make_urban_drive(
            n_poses=45, blocks=2, block_size=60.0, speed=8.0
        )
        dyn = synthetic.make_moving_objects(seed=0, blocks=2, block_size=60.0)
        step = jax.jit(slam.slam_step, static_argnums=(2,))
        state = slam.init_state(cfg, initial_pose=se3.index(gt, 0))
        poses = []
        for scan, ts in synthetic.velodyne_stream(
            world, gt, capacity=cfg.max_raw_points, azimuth_bins=1024, seed=3,
            distortion=True, deskew=deskew, dynamic=dyn,
            noise_range_coeff=3e-4, dropout=0.08,
        ):
            state, out = step(state, scan, cfg, ts)
            poses.append(out.pose_map)
        ate, _ = metrics.ate(se3.stack(poses), gt, align=False)
        return float(ate), state

    def test_sensor_physics_degradation_is_bounded(self):
        """VERDICT r2 item 5: with full sensor physics — per-azimuth
        motion distortion (the sweep smears across ~0.8 m of motion),
        range-growing noise, 8% dropout, moving traffic — raw (skewed)
        tracking degrades but must stay bounded, and INS-assisted de-skew
        at ingest must recover most of it. Calibrated at this seed:
        skewed 0.209 m, de-skewed 0.067 m (idealized render: 0.025 m)."""
        ate_raw, st_raw = self._physics_run(deskew=False)
        assert ate_raw < 0.5, ate_raw          # bounded, not broken
        assert int(st_raw.keyframes.count) >= 10
        ate_fix, _ = self._physics_run(deskew=True)
        assert ate_fix < 0.15, ate_fix         # de-skew recovers tracking
        assert ate_fix < ate_raw
