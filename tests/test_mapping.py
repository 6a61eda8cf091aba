"""Tests for the voxel map (occupancy dedup, lookup, approx-NN) and
scan-to-map refinement, vs brute-force references."""

import jax
import jax.numpy as jnp
import numpy as np

from icpslam_tpu import cloud as pc
from icpslam_tpu.config import IcpConfig, tiny_config
from icpslam_tpu.geometry import quaternion as quat
from icpslam_tpu.geometry import se3
from icpslam_tpu.geometry.se3 import Pose
from icpslam_tpu.io import synthetic
from icpslam_tpu.mapping import scan_to_map, voxel_map as vm


class TestVoxelMap:
    def test_insert_and_lookup(self):
        m = vm.empty_map(64)
        pts = np.array([[0.1, 0.1, 0.1], [1.1, 0.1, 0.1], [0.15, 0.12, 0.11]], np.float32)
        cloud = pc.from_points(pts, capacity=8)
        m = vm.insert(m, cloud, resolution=0.5)
        assert int(m.size) == 2  # first and third share a voxel
        coords = jnp.array([[0, 0, 0], [2, 0, 0], [5, 5, 5]], jnp.int32)
        found, idx = vm.lookup(m, coords)
        np.testing.assert_array_equal(np.asarray(found), [True, True, False])

    def test_first_wins_occupancy(self):
        m = vm.empty_map(16)
        c1 = pc.from_points(np.array([[0.1, 0.1, 0.1]], np.float32), capacity=4)
        c2 = pc.from_points(np.array([[0.4, 0.4, 0.4]], np.float32), capacity=4)
        m = vm.insert(m, c1, resolution=0.5)
        m = vm.insert(m, c2, resolution=0.5)  # same voxel → dropped
        assert int(m.size) == 1
        live = np.asarray(m.points)[np.asarray(m.occupancy_mask())]
        np.testing.assert_allclose(live, [[0.1, 0.1, 0.1]], atol=1e-6)

    def test_reset(self):
        m = vm.empty_map(16)
        m = vm.insert(m, pc.from_points(np.random.randn(8, 3), capacity=8), 0.5)
        m = vm.reset(m)
        assert int(m.size) == 0 and int(m.overflow) == 0

    def test_overflow_counted(self):
        m = vm.empty_map(4)
        rng = np.random.RandomState(0)
        cloud = pc.from_points(rng.uniform(-10, 10, (32, 3)).astype(np.float32), capacity=32)
        m = vm.insert(m, cloud, resolution=0.5)
        assert int(m.size) == 4
        assert int(m.overflow) > 0

    def test_sorted_invariant_after_inserts(self):
        m = vm.empty_map(128)
        rng = np.random.RandomState(1)
        for i in range(4):
            cloud = pc.from_points(rng.uniform(-5, 5, (30, 3)).astype(np.float32), capacity=32)
            m = vm.insert(m, cloud, resolution=0.4)
        keys = np.asarray(m.keys)[: int(m.size)]
        as_tuples = [tuple(k) for k in keys]
        assert as_tuples == sorted(as_tuples)
        assert len(set(as_tuples)) == len(as_tuples)  # no duplicates

    def test_approx_nn_matches_bruteforce_in_radius(self):
        rng = np.random.RandomState(2)
        map_pts = rng.uniform(-3, 3, (200, 3)).astype(np.float32)
        res = 0.5
        m = vm.empty_map(512)
        m = vm.insert(m, pc.from_points(map_pts, capacity=256), res)
        live = np.asarray(m.points)[np.asarray(m.occupancy_mask())]

        q = rng.uniform(-2.5, 2.5, (50, 3)).astype(np.float32)
        nn = vm.approx_nn(m, jnp.asarray(q), jnp.ones(50, bool), res, radius=1)
        # brute force against the live representatives, limited to 3^3 voxels
        for qi, (p, d2, f) in enumerate(
            zip(np.asarray(nn.points), np.asarray(nn.dist2), np.asarray(nn.found))
        ):
            dd = ((live - q[qi]) ** 2).sum(-1)
            best = live[dd.argmin()]
            # the brute-force best is within the searched neighborhood iff its
            # voxel is adjacent; then approx == exact
            if np.all(np.abs(np.floor(best / res) - np.floor(q[qi] / res)) <= 1):
                assert f
                np.testing.assert_allclose(p, best, atol=1e-6)

    def test_nn_not_found_far_away(self):
        m = vm.empty_map(64)
        m = vm.insert(m, pc.from_points(np.zeros((1, 3), np.float32), capacity=4), 0.5)
        nn = vm.approx_nn(m, jnp.array([[50.0, 50.0, 50.0]]), jnp.ones(1, bool), 0.5)
        assert not bool(nn.found[0])
        assert np.isinf(float(nn.dist2[0]))

    def test_jit(self):
        m = vm.empty_map(64)
        cloud = pc.from_points(np.random.randn(16, 3).astype(np.float32), capacity=16)
        ins = jax.jit(vm.insert, static_argnums=(2,))
        m = ins(m, cloud, 0.5)
        assert int(m.size) > 0


class TestScanToMap:
    def _cfg(self):
        return tiny_config(
            voxel_leaf_size=0.3,
            map_resolution=0.3,
            icp_mapping=IcpConfig(mode="point", max_iterations=20),
            max_points=2048,
            max_raw_points=2048,
            max_map_points=8192,
        )

    def test_seed_empty_map(self):
        cfg = self._cfg()
        world = synthetic.make_room_world(seed=0, n_points=6000)
        scan = synthetic.render_scan(world, np.zeros(3), np.array([1, 0, 0, 0.0]), n_points=800)
        cloud = pc.from_points(scan, capacity=2048)
        m = vm.empty_map(cfg.max_map_points)
        res = scan_to_map.refine_and_grow(m, cloud, se3.identity(), cfg)
        assert not bool(res.success)
        assert int(res.map.size) > 0

    def test_refine_corrects_drifted_pose(self):
        cfg = self._cfg()
        world = synthetic.make_room_world(seed=1, n_points=12000)
        gt_pose = Pose(t=jnp.array([0.0, 0.0, 1.0]), q=quat.identity())
        scan = synthetic.render_scan(
            world, np.asarray(gt_pose.t), np.asarray(gt_pose.q), n_points=1500, noise=0.005
        )
        cloud = pc.from_points(scan, capacity=2048)
        # seed map with a scan at the true pose
        m = vm.empty_map(cfg.max_map_points)
        seed_res = scan_to_map.refine_and_grow(m, cloud, gt_pose, cfg)
        m = seed_res.map
        # now present a second scan with a *drifted* pose estimate
        scan2 = synthetic.render_scan(
            world, np.asarray(gt_pose.t), np.asarray(gt_pose.q), n_points=1500,
            noise=0.005, seed=7,
        )
        cloud2 = pc.from_points(scan2, capacity=2048)
        drift = Pose(t=jnp.array([0.12, -0.08, 0.03]), q=quat.from_rpy(0.0, 0.0, 0.03))
        raw_pose = se3.compose(gt_pose, drift)
        res = scan_to_map.refine_and_grow(m, cloud2, raw_pose, cfg)
        assert bool(res.success)
        err_before = float(se3.distance_translation(raw_pose, gt_pose))
        err_after = float(se3.distance_translation(res.refined_pose, gt_pose))
        assert err_after < err_before * 0.5, (err_before, err_after)
        assert int(res.map.size) >= int(m.size)

    def test_failure_leaves_map_unchanged(self):
        cfg = self._cfg()
        rng = np.random.RandomState(3)
        m = vm.empty_map(cfg.max_map_points)
        seed_cloud = pc.from_points(rng.randn(500, 3).astype(np.float32), capacity=2048)
        m = scan_to_map.refine_and_grow(m, seed_cloud, se3.identity(), cfg).map
        size_before = int(m.size)
        # garbage scan far away → no NN found → not converged
        far = pc.from_points(
            (rng.randn(500, 3) + 500.0).astype(np.float32), capacity=2048
        )
        res = scan_to_map.refine_and_grow(m, far, se3.identity(), cfg)
        assert not bool(res.success)
        assert int(res.map.size) == size_before
        np.testing.assert_allclose(
            np.asarray(res.refined_pose.t), np.zeros(3), atol=1e-7
        )


class TestStoredCovariances:
    """Point-map per-point covariance storage + gathering (scan-to-map
    plane mode gathers target covariances instead of recomputing them)."""

    def test_insert_and_gather_roundtrip(self):
        import jax.numpy as jnp
        from icpslam_tpu.mapping import point_map as pm
        from icpslam_tpu.ops.linalg3 import mat_to_sym6, sym6_to_mat

        rng = np.random.RandomState(0)
        pts = rng.randn(8, 3).astype(np.float32) * 5
        # distinct anisotropic symmetric covariances
        covs = np.stack([np.eye(3, dtype=np.float32) * (i + 1) for i in range(8)])
        covs[:, 0, 1] = covs[:, 1, 0] = 0.25
        m = pm.empty_map(32)
        m = pm.insert_with_nn(
            m,
            pc.from_points(pts, capacity=8),
            0.1,
            jnp.full((8,), jnp.inf, jnp.float32),
            covs=mat_to_sym6(jnp.asarray(covs)),
        )
        assert int(m.size) == 8
        res, got = pm.exact_nn_with_covs(
            m, jnp.asarray(pts), jnp.ones(8, bool)
        )
        assert bool(np.all(np.asarray(res.found)))
        np.testing.assert_allclose(np.asarray(sym6_to_mat(got)), covs, atol=1e-6)

    def test_unfound_gets_identity(self):
        import jax.numpy as jnp
        from icpslam_tpu.mapping import point_map as pm

        from icpslam_tpu.ops.linalg3 import sym6_to_mat

        m = pm.empty_map(16)  # empty → nothing found
        res, got = pm.exact_nn_with_covs(
            m, jnp.zeros((4, 3)), jnp.ones(4, bool)
        )
        assert not bool(np.any(np.asarray(res.found)))
        np.testing.assert_allclose(
            np.asarray(sym6_to_mat(got)),
            np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6,
        )

    def test_refine_uses_stored_covs_and_matches_recompute_quality(self):
        """Plane-mode scan-to-map with gathered covariances still recovers
        a known small offset."""
        import dataclasses
        import jax
        import jax.numpy as jnp
        from icpslam_tpu.config import IcpConfig, SlamConfig
        from icpslam_tpu.geometry import se3
        from icpslam_tpu.io import synthetic
        from icpslam_tpu.mapping import backend as map_backend
        from icpslam_tpu.mapping import scan_to_map

        cfg = SlamConfig(
            voxel_leaf_size=0.3,
            map_resolution=0.3,
            icp_mapping=IcpConfig(mode="plane", max_iterations=15),
            max_points=512,
            max_raw_points=512,
            max_map_points=2048,
        )
        world = synthetic.make_room_world(seed=3, n_points=6000, size=10.0)
        origin = se3.identity()
        scan_pts = synthetic.render_scan(
            world, np.zeros(3), np.array([0, 0, 0, 1.0]), n_points=500,
            noise=0.005, seed=1,
        )
        scan = pc.from_points(scan_pts, capacity=512)
        m = map_backend.empty(cfg)
        r0 = scan_to_map.refine_and_grow(m, scan, origin, cfg)  # seed
        assert int(r0.map.size) > 0
        # same scan, slightly offset pose — refinement should pull it back
        off = se3.Pose(
            t=jnp.array([0.06, -0.04, 0.0]), q=se3.identity().q
        )
        r1 = jax.jit(
            lambda mm, s, p: scan_to_map.refine_and_grow(mm, s, p, cfg),
        )(r0.map, scan, off)
        assert bool(r1.success)
        # refined pose should be closer to identity than the raw offset
        err_raw = float(jnp.linalg.norm(off.t))
        err_ref = float(jnp.linalg.norm(r1.refined_pose.t))
        assert err_ref < 0.5 * err_raw, (err_raw, err_ref)


class TestRingEviction:
    """map_eviction='ring' (point backend): a full map overwrites its
    OLDEST points instead of dropping new geometry — overflow counts
    evictions (the reference's octree grows without bound instead,
    octree_mapper.cpp:63-70)."""

    def test_ring_overwrites_oldest(self):
        import jax.numpy as jnp

        from icpslam_tpu.cloud import pointcloud as pc
        from icpslam_tpu.mapping import point_map as pm

        C = 64
        m = pm.empty_map(C)
        # three waves of 32 well-separated points each: 96 total into 64
        def wave(k):
            pts = np.zeros((32, 3), np.float32)
            pts[:, 0] = np.arange(32) * 10.0
            pts[:, 1] = k * 1000.0
            return pc.from_points(pts, capacity=32)

        for k in range(3):
            m = pm.insert(m, wave(k), resolution=0.5, eviction="ring")
        assert int(m.size) == C
        assert int(m.overflow) == 32  # evictions, counted
        ys = np.asarray(m.points)[:, 1]
        # wave 0 (y=0) was fully evicted by wave 2; waves 1 and 2 live
        live = ys[np.asarray(m.occupancy_mask())]
        assert (np.sort(np.unique(live)) == [1000.0, 2000.0]).all(), np.unique(live)

    def test_none_drops_and_counts(self):
        from icpslam_tpu.cloud import pointcloud as pc
        from icpslam_tpu.mapping import point_map as pm

        C = 64
        m = pm.empty_map(C)
        def wave(k):
            pts = np.zeros((32, 3), np.float32)
            pts[:, 0] = np.arange(32) * 10.0
            pts[:, 1] = k * 1000.0
            return pc.from_points(pts, capacity=32)

        for k in range(3):
            m = pm.insert(m, wave(k), resolution=0.5)
        assert int(m.size) == C
        assert int(m.overflow) == 32  # drops, counted
        ys = np.asarray(m.points)[:, 1][np.asarray(m.occupancy_mask())]
        # waves 0 and 1 live; wave 2 was dropped
        assert (np.sort(np.unique(ys)) == [0.0, 1000.0]).all()

    def test_pipeline_keeps_absorbing_with_ring(self):
        """reset_map_on_optimize=False + tiny map + ring: the map keeps
        absorbing RECENT geometry all mission (VERDICT r3 weak #6: with
        'none' it silently stops integrating once full)."""
        import jax

        from icpslam_tpu.config import IcpConfig, tiny_config
        from icpslam_tpu.geometry import se3
        from icpslam_tpu.io import synthetic
        from icpslam_tpu.pipeline import slam

        cfg = tiny_config(
            voxel_leaf_size=0.3, map_resolution=0.3,
            icp_odometry=IcpConfig(mode="plane", max_iterations=8),
            icp_mapping=IcpConfig(mode="point", max_iterations=10),
            max_points=1024, max_raw_points=2048, max_map_points=2048,
            max_keyframes=64, max_edges=256,
            reset_map_on_optimize=False, map_eviction="ring",
        )
        world = synthetic.make_room_world(seed=0, n_points=12000)
        gt = synthetic.make_loop_trajectory(n_poses=30, radius=5.0, laps=1.2)
        step = jax.jit(slam.slam_step, static_argnums=(2,))
        st = slam.init_state(cfg, initial_pose=se3.index(gt, 0))
        for scan in synthetic.scan_stream(
            world, gt, capacity=cfg.max_raw_points, max_range=12.0,
            n_points=1200, noise=0.01,
        ):
            st, out = step(st, scan, cfg)
        assert int(st.map.size) == cfg.max_map_points  # full…
        assert int(st.map.overflow) > 0                # …and still absorbing
        assert bool(np.isfinite(np.asarray(st.slam_pose.t)).all())
