"""Tests for wheel-odometry ingestion, bootstrap, and graph fusion."""

import jax
import jax.numpy as jnp
import numpy as np

from icpslam_tpu.config import IcpConfig, tiny_config
from icpslam_tpu.geometry import quaternion as quat
from icpslam_tpu.geometry import se3
from icpslam_tpu.geometry.se3 import Pose
from icpslam_tpu.io import synthetic
from icpslam_tpu.pipeline import robot_odometry as ro
from icpslam_tpu.pipeline import slam


def pose_xy(x, y, yaw=0.0):
    return Pose(t=jnp.array([x, y, 0.0]), q=quat.from_rpy(0.0, 0.0, yaw))


class TestRobotOdometer:
    def test_offset_removal(self):
        cfg = tiny_config()
        state = ro.init_state()
        state, out = ro.robot_odometry_step(state, pose_xy(5.0, 3.0), cfg)
        assert bool(out.is_first)
        np.testing.assert_allclose(np.asarray(out.pose.t), 0.0, atol=1e-6)
        state, out = ro.robot_odometry_step(state, pose_xy(5.5, 3.0), cfg)
        np.testing.assert_allclose(np.asarray(out.pose.t), [0.5, 0, 0], atol=1e-6)

    def test_pose_gate(self):
        cfg = tiny_config()  # gate = 0.1 m (reference POSE_DIST_THRESH)
        state = ro.init_state()
        state, out = ro.robot_odometry_step(state, pose_xy(0, 0), cfg)
        assert bool(out.gated)
        state, out = ro.robot_odometry_step(state, pose_xy(0.05, 0), cfg)
        assert not bool(out.gated)
        assert int(state.num_poses) == 1
        state, out = ro.robot_odometry_step(state, pose_xy(0.15, 0), cfg)
        assert bool(out.gated)
        assert int(state.num_poses) == 2
        assert int(state.num_received) == 3

    def test_jit(self):
        cfg = tiny_config()
        step = jax.jit(ro.robot_odometry_step, static_argnums=(2,))
        state = ro.init_state()
        state, out = step(state, pose_xy(1.0, 2.0), cfg)
        assert bool(state.initialized)


class TestWheelFusion:
    def _cfg(self, **over):
        base = dict(
            voxel_leaf_size=0.3,
            map_resolution=0.3,
            icp_odometry=IcpConfig(mode="point", max_iterations=10),
            icp_mapping=IcpConfig(mode="point", max_iterations=10),
            max_points=512,
            max_raw_points=2048,
            max_map_points=4096,
            max_keyframes=32,
            max_edges=128,
        )
        base.update(over)
        return tiny_config(**base)

    def test_wheel_bootstrap_sets_initial_pose(self):
        cfg = self._cfg()
        state = slam.init_state(cfg)
        wheel = pose_xy(2.0, 1.0, 0.3)
        # feed two wheel messages before any scan
        state = slam.ingest_wheel_odometry(state, pose_xy(10.0, 10.0), cfg)
        state = slam.ingest_wheel_odometry(
            state, se3.compose(pose_xy(10.0, 10.0), wheel), cfg
        )
        # offset-removed wheel pose seeds the odometer
        np.testing.assert_allclose(
            np.asarray(state.odom.pose.t), np.asarray(wheel.t), atol=1e-5
        )

    def test_wheel_edges_added(self):
        cfg = self._cfg(enable_wheel_odom_edges=True, keyframe_distance=0.3)
        world = synthetic.make_room_world(seed=0, n_points=8000)
        gt = synthetic.make_loop_trajectory(n_poses=8, radius=5.0, laps=0.25)
        step = jax.jit(slam.slam_step, static_argnums=(2,))
        ingest = jax.jit(slam.ingest_wheel_odometry, static_argnums=(2,))
        state = slam.init_state(cfg, initial_pose=se3.index(gt, 0))
        n_kf = 0
        for i, scan in enumerate(
            synthetic.scan_stream(world, gt, capacity=2048, n_points=800, seed=0)
        ):
            # wheel odometry = ground truth (a perfect wheel encoder)
            state = ingest(state, se3.index(gt, i), cfg)
            state, out = step(state, scan, cfg)
            n_kf = int(out.num_keyframes)
        assert n_kf >= 3
        # edges: (n_kf - 1) sequential ICP + (n_kf - 1) wheel (+ any loops)
        assert int(state.edges.count) >= 2 * (n_kf - 1)

    def test_wheel_edges_disabled_by_default(self):
        cfg = self._cfg()
        assert not cfg.enable_wheel_odom_edges
        world = synthetic.make_room_world(seed=1, n_points=6000)
        gt = synthetic.make_loop_trajectory(n_poses=5, radius=5.0, laps=0.2)
        step = jax.jit(slam.slam_step, static_argnums=(2,))
        state = slam.init_state(cfg, initial_pose=se3.index(gt, 0))
        for i, scan in enumerate(
            synthetic.scan_stream(world, gt, capacity=2048, n_points=800, seed=1)
        ):
            state = slam.ingest_wheel_odometry(state, se3.index(gt, i), cfg)
            state, out = step(state, scan, cfg)
        n_kf = int(state.keyframes.count)
        # only sequential edges + loop closures — crucially, no wheel edges
        n_loops = int(state.num_loop_closures)
        assert int(state.edges.count) == (n_kf - 1) + n_loops
