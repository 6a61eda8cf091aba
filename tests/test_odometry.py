"""Integration test: scan-to-scan ICP odometry on a synthetic loop with
known ground truth — drift bounds per SURVEY.md §4 (the reference's missing
test pyramid)."""

import jax
import jax.numpy as jnp
import numpy as np

from icpslam_tpu import cloud as pc
from icpslam_tpu.config import IcpConfig, tiny_config
from icpslam_tpu.eval import metrics
from icpslam_tpu.geometry import se3
from icpslam_tpu.io import synthetic
from icpslam_tpu.pipeline import odometry


def run_odometry(cfg, n_poses=30, noise=0.01, seed=0):
    world = synthetic.make_room_world(seed=seed, n_points=12000)
    gt = synthetic.make_loop_trajectory(n_poses=n_poses, radius=5.0)
    step = jax.jit(odometry.odometry_step, static_argnums=(2,))
    state = odometry.init_state(cfg, initial_pose=se3.index(gt, 0))
    est_poses = []
    outs = []
    for scan in synthetic.scan_stream(
        world, gt, capacity=cfg.max_raw_points, max_range=12.0,
        n_points=1500, noise=noise, seed=seed,
    ):
        state, out = step(state, scan, cfg)
        est_poses.append(out.pose)
        outs.append(out)
    return se3.stack(est_poses), gt, outs


class TestOdometry:
    def test_loop_drift_bound_gicp(self):
        # the reference's actual algorithm: GICP (plane-to-plane)
        cfg = tiny_config(
            voxel_leaf_size=0.3,
            icp_odometry=IcpConfig(mode="plane", max_iterations=15),
            max_points=2048,
            max_raw_points=2048,
        )
        est, gt, outs = run_odometry(cfg)
        # all but the bootstrap scan must register and be accepted
        assert all(bool(o.accepted) for o in outs[1:])
        ate_rmse, _ = metrics.ate(est, gt, align=False)
        assert ate_rmse < 0.3, f"ATE {ate_rmse}"
        t_rpe, r_rpe = metrics.rpe(est, gt)
        assert t_rpe < 0.05, f"RPE {t_rpe}"

    def test_point_mode_coarser_but_bounded(self):
        cfg = tiny_config(
            voxel_leaf_size=0.3,
            icp_odometry=IcpConfig(mode="point", max_iterations=15),
            max_points=2048,
            max_raw_points=2048,
        )
        est, gt, outs = run_odometry(cfg, n_poses=60)
        ate_rmse, _ = metrics.ate(est, gt, align=False)
        assert ate_rmse < 1.0, f"ATE {ate_rmse}"

    def test_bootstrap_and_skip(self):
        cfg = tiny_config(
            voxel_leaf_size=0.3,
            icp_odometry=IcpConfig(mode="point"),
            max_points=512,
            max_raw_points=2048,
            num_clouds_skip=1,
        )
        world = synthetic.make_room_world(seed=1, n_points=8000)
        gt = synthetic.make_loop_trajectory(n_poses=6, radius=5.0)
        step = jax.jit(odometry.odometry_step, static_argnums=(2,))
        state = odometry.init_state(cfg)
        processed = []
        for scan in synthetic.scan_stream(world, gt, capacity=2048, n_points=800):
            state, out = step(state, scan, cfg)
            processed.append(bool(out.processed))
        # scan0 = bootstrap (not registered), then alternate skip/process
        assert processed[0] is False
        # with num_clouds_skip=1 every other scan is skipped
        assert processed[1] is False and processed[2] is True
        assert processed[3] is False and processed[4] is True

    def test_accumulator_drain(self):
        cfg = tiny_config(
            voxel_leaf_size=0.3,
            icp_odometry=IcpConfig(mode="point"),
            max_points=512,
            max_raw_points=2048,
        )
        world = synthetic.make_room_world(seed=2, n_points=8000)
        gt = synthetic.make_loop_trajectory(n_poses=5, radius=5.0)
        step = jax.jit(odometry.odometry_step, static_argnums=(2,))
        state = odometry.init_state(cfg, initial_pose=se3.index(gt, 0))
        for scan in synthetic.scan_stream(world, gt, capacity=2048, n_points=800, seed=2):
            state, out = step(state, scan, cfg)
        accum, state = odometry.drain_accumulator(state)
        # accumulated relative transform == pose change since start
        expect = se3.relative(se3.index(gt, 0), state.pose)
        np.testing.assert_allclose(np.asarray(accum.t), np.asarray(expect.t), atol=1e-4)
        # after drain the accumulator is identity
        accum2, _ = odometry.drain_accumulator(state)
        np.testing.assert_allclose(np.asarray(accum2.t), np.zeros(3), atol=1e-7)

    def test_rejection_keeps_pose(self):
        # feed garbage (no overlap) as the second scan: pose must not move
        cfg = tiny_config(
            voxel_leaf_size=0.3,
            icp_odometry=IcpConfig(mode="point"),
            max_points=512,
            max_raw_points=2048,
        )
        rng = np.random.RandomState(3)
        step = jax.jit(odometry.odometry_step, static_argnums=(2,))
        state = odometry.init_state(cfg)
        scan1 = pc.from_points(rng.randn(500, 3).astype(np.float32), capacity=2048)
        scan2 = pc.from_points(
            rng.randn(500, 3).astype(np.float32) + 1000.0, capacity=2048
        )
        state, _ = step(state, scan1, cfg)
        pose_before = state.pose
        state, out = step(state, scan2, cfg)
        assert bool(out.processed) and not bool(out.accepted)
        np.testing.assert_allclose(
            np.asarray(state.pose.t), np.asarray(pose_before.t), atol=1e-7
        )

    def test_rejection_keeps_prev_cloud(self):
        # regression (review finding): a rejected registration must NOT
        # replace prev_cloud, so the next scan recovers the full motion
        cfg = tiny_config(
            voxel_leaf_size=0.3,
            icp_odometry=IcpConfig(mode="point"),
            max_points=512,
            max_raw_points=2048,
        )
        rng = np.random.RandomState(7)
        step = jax.jit(odometry.odometry_step, static_argnums=(2,))
        state = odometry.init_state(cfg)
        base = rng.randn(400, 3).astype(np.float32)
        scan1 = pc.from_points(base, capacity=2048)
        garbage = pc.from_points(
            (rng.randn(400, 3) + 1000.0).astype(np.float32), capacity=2048
        )
        state, _ = step(state, scan1, cfg)
        cloud_before = np.asarray(state.prev_cloud.points).copy()
        state, out = step(state, garbage, cfg)
        assert not bool(out.accepted)
        np.testing.assert_array_equal(
            np.asarray(state.prev_cloud.points), cloud_before
        )
        # a good scan (same as scan1, slightly shifted) still registers
        shifted = pc.from_points(base + np.array([0.05, 0, 0], np.float32), capacity=2048)
        state, out = step(state, shifted, cfg)
        assert bool(out.accepted)
