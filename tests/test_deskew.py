"""In-loop motion de-skew: device warp correctness + the skew-aware
registration solvers (no-INS de-skew, DESIGN §14)."""

import jax
import jax.numpy as jnp
import numpy as np

from icpslam_tpu.cloud import deskew as dsk
from icpslam_tpu.cloud import pointcloud as pc
from icpslam_tpu.config import IcpConfig
from icpslam_tpu.geometry import quaternion as quat
from icpslam_tpu.geometry import se3
from icpslam_tpu.geometry.se3 import Pose
from icpslam_tpu.io import synthetic
from icpslam_tpu.ops import covariance, skew_icp


class TestDeskewWarp:
    def test_matches_host_deskew(self):
        """Device-side deskew_points == the host INS path
        (io/synthetic.deskew_scan) on identical inputs."""
        rng = np.random.RandomState(0)
        pts = rng.uniform(-20, 20, (400, 3)).astype(np.float32)
        axis = np.array([0.1, 0.2, 0.97])
        axis /= np.linalg.norm(axis)
        rel_q = np.asarray(quat.from_axis_angle(
            jnp.asarray(axis, jnp.float32), jnp.asarray(0.14, jnp.float32)))
        rel_t = np.array([1.5, 0.3, 0.05], np.float32)
        times = rng.uniform(0, 1, 400).astype(np.float32)

        host = synthetic.deskew_scan(pts, rel_t, rel_q, times=times)
        dev = np.asarray(dsk.deskew_points(
            jnp.asarray(pts), jnp.asarray(times),
            Pose(t=jnp.asarray(rel_t), q=jnp.asarray(rel_q)),
        ))
        np.testing.assert_allclose(host, dev, atol=1e-5)

    def test_sweep_fraction_from_azimuth(self):
        rng = np.random.RandomState(1)
        pts = rng.uniform(-10, 10, (256, 3)).astype(np.float32)
        u = np.asarray(dsk.sweep_fraction(jnp.asarray(pts)))
        az = np.arctan2(pts[:, 1], pts[:, 0])
        np.testing.assert_allclose(u, (az + np.pi) / (2 * np.pi), atol=1e-6)
        assert (u >= 0).all() and (u < 1).all()

    def test_identity_motion_is_noop(self):
        rng = np.random.RandomState(2)
        pts = jnp.asarray(rng.uniform(-5, 5, (64, 3)).astype(np.float32))
        u = jnp.asarray(rng.uniform(0, 1, 64).astype(np.float32))
        out = dsk.deskew_points(pts, u, se3.identity())
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-7)


def _velodyne_pair(rel_t, rel_q, seed=0, n=2048, leaf=0.6):
    """Two consecutive smeared sweeps of the urban world + gt rel.

    scan0 smears over interval 0→1 (= rel); scan1 over 1→2 (constant
    velocity continuation) — the physics the coupled solver models.
    """
    world = synthetic.make_urban_world(seed=seed)
    t0 = np.array([0.0, 0.0, 1.7])
    q0 = np.asarray(quat.identity(), np.float64)
    R = np.asarray(quat.to_matrix(jnp.asarray(rel_q, jnp.float32)))
    t1 = t0 + rel_t
    q1 = np.asarray(quat.multiply(jnp.asarray(q0, jnp.float32),
                                  jnp.asarray(rel_q, jnp.float32)), np.float64)
    t2 = t1 + R @ rel_t
    q2 = np.asarray(quat.multiply(jnp.asarray(q1, jnp.float32),
                                  jnp.asarray(rel_q, jnp.float32)), np.float64)
    s0 = synthetic.render_velodyne_scan(
        world, t0, q0, max_range=60.0, seed=seed + 1,
        next_pose_t=t1, next_pose_q=q1)
    s1 = synthetic.render_velodyne_scan(
        world, t1, q1, max_range=60.0, seed=seed + 2,
        next_pose_t=t2, next_pose_q=q2)
    from icpslam_tpu.cloud.voxel import voxel_downsample

    f0, _ = voxel_downsample(pc.from_points(s0.astype(np.float32),
                                            capacity=16384), leaf, n)
    f1, _ = voxel_downsample(pc.from_points(s1.astype(np.float32),
                                            capacity=16384), leaf, n)
    gt = Pose(t=jnp.asarray(rel_t, jnp.float32),
              q=jnp.asarray(rel_q, jnp.float32))
    return f0, f1, gt


class TestCoupledDeskewIcp:
    def test_recovers_motion_straight(self):
        rel_t = np.array([0.8, 0.0, 0.0])
        f0, f1, gt = _velodyne_pair(rel_t, np.asarray(quat.identity()))
        cfg = IcpConfig(mode="plane", max_iterations=15,
                        max_correspondence_distance=2.0, huber_delta=1.0)
        res = skew_icp.coupled_deskew_icp(
            f1, f0, dsk.sweep_fraction(f0.points), cfg,
            source_u=dsk.sweep_fraction(f1.points),
            init=se3.identity(),
            source_covs=covariance.gicp_covariances(f1, k=10),
            target_covs=covariance.gicp_covariances(f0, k=10),
        )
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.pose.t), rel_t, atol=0.05)
        assert float(se3.distance_rotation(res.pose, gt)) < 0.01

    def test_recovers_motion_turning(self):
        # an 8°/scan corner — exactly where seed-based de-skew fails
        rel_t = np.array([0.8, 0.1, 0.0])
        rel_q = np.asarray(quat.from_axis_angle(
            jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
            jnp.asarray(np.radians(8.0), jnp.float32)))
        f0, f1, gt = _velodyne_pair(rel_t, rel_q, seed=3)
        cfg = IcpConfig(mode="plane", max_iterations=20,
                        max_correspondence_distance=2.0, huber_delta=1.0)
        res = skew_icp.coupled_deskew_icp(
            f1, f0, dsk.sweep_fraction(f0.points), cfg,
            source_u=dsk.sweep_fraction(f1.points),
            init=se3.identity(),
            source_covs=covariance.gicp_covariances(f1, k=10),
            target_covs=covariance.gicp_covariances(f0, k=10),
        )
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.pose.t), rel_t, atol=0.08)
        assert float(se3.distance_rotation(res.pose, gt)) < 0.015

    def test_unmodeled_source_smear_is_the_failure_mode(self):
        """Documents WHY both clouds must be warped: dropping the source
        term re-introduces the azimuth-correlated aliasing (a large bias
        toward over-estimated motion, DESIGN §14)."""
        rel_t = np.array([0.8, 0.0, 0.0])
        f0, f1, gt = _velodyne_pair(rel_t, np.asarray(quat.identity()))
        cfg = IcpConfig(mode="plane", max_iterations=15,
                        max_correspondence_distance=2.0, huber_delta=1.0)
        res = skew_icp.coupled_deskew_icp(
            f1, f0, dsk.sweep_fraction(f0.points), cfg,
            source_u=None,  # source treated as clean — it is not
            init=se3.identity(),
            source_covs=covariance.gicp_covariances(f1, k=10),
            target_covs=covariance.gicp_covariances(f0, k=10),
        )
        bias = abs(float(res.pose.t[0]) - rel_t[0])
        assert bias > 0.2, bias  # the aliasing is large, not subtle


class TestOdometryCoupledMode:
    def test_three_scan_sequence_tracks(self):
        from icpslam_tpu.config import kitti_config
        from icpslam_tpu.pipeline import odometry

        rel_t = np.array([0.8, 0.0, 0.0])
        world = synthetic.make_urban_world(seed=0)
        poses_t = [np.array([0.0, 0.0, 1.7]) + i * rel_t for i in range(4)]
        q = np.asarray(quat.identity(), np.float64)
        scans = [
            pc.from_points(
                synthetic.render_velodyne_scan(
                    world, poses_t[i], q, max_range=60.0, seed=i,
                    next_pose_t=poses_t[i + 1], next_pose_q=q,
                ).astype(np.float32),
                capacity=16384,
            )
            for i in range(3)
        ]
        cfg = kitti_config(
            max_raw_points=16384, max_points=2048, voxel_leaf_size=0.6,
            deskew_rounds=1, deskew_mode="coupled",
        )
        step = jax.jit(odometry.odometry_step, static_argnums=(2,))
        st = odometry.init_state(cfg)
        rels = []
        for s in scans:
            st, out = step(st, s, cfg)
            rels.append((np.asarray(out.transform.t), bool(out.accepted)))
        assert rels[1][1] and rels[2][1]
        np.testing.assert_allclose(rels[1][0], rel_t, atol=0.1)
        np.testing.assert_allclose(rels[2][0], rel_t, atol=0.1)
