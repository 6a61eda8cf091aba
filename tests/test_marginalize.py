"""Keyframe marginalization (graph/marginalize.py): covariance
composition correctness, edge re-homing, store compaction, victim
selection, and the slam_step integration that lets missions outlive
``max_keyframes`` (VERDICT r4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icpslam_tpu.cloud import pointcloud as pc
from icpslam_tpu.geometry import se3
from icpslam_tpu.geometry.se3 import Pose
from icpslam_tpu.graph import keyframes as kf
from icpslam_tpu.graph import marginalize as marg
from icpslam_tpu.graph import pose_graph as pg


def _rand_pose(rng, scale=1.0):
    xi = jnp.asarray(rng.randn(6) * scale, jnp.float32)
    return se3.se3_exp(xi)


class TestCovarianceAlgebra:
    def test_compose_covariance_monte_carlo(self):
        """Analytic composed covariance matches sampling to first order."""
        rng = np.random.RandomState(3)
        Za = _rand_pose(rng, 0.5)
        Zb = _rand_pose(rng, 0.5)
        A = rng.randn(6, 6) * 0.02
        Sa = jnp.asarray(A @ A.T + 1e-4 * np.eye(6), jnp.float32)
        B = rng.randn(6, 6) * 0.02
        Sb = jnp.asarray(B @ B.T + 1e-4 * np.eye(6), jnp.float32)

        n = 4000
        La = np.linalg.cholesky(np.asarray(Sa, np.float64))
        Lb = np.linalg.cholesky(np.asarray(Sb, np.float64))
        xa = jnp.asarray((La @ rng.randn(6, n)).T, jnp.float32)
        xb = jnp.asarray((Lb @ rng.randn(6, n)).T, jnp.float32)

        def sample(ea, eb):
            Zp = se3.compose(
                se3.compose(Za, se3.se3_exp(ea)),
                se3.compose(Zb, se3.se3_exp(eb)),
            )
            return se3.se3_log(se3.relative(se3.compose(Za, Zb), Zp))

        d = jax.vmap(sample)(xa, xb)
        emp = np.cov(np.asarray(d).T)
        ana = np.asarray(marg.compose_covariance(Za, Sa, Zb, Sb), np.float64)
        # first-order algebra vs sampled second moments: relative Frobenius
        err = np.linalg.norm(emp - ana) / np.linalg.norm(ana)
        assert err < 0.15, err

    def test_inverse_covariance_monte_carlo(self):
        rng = np.random.RandomState(5)
        Z = _rand_pose(rng, 0.7)
        A = rng.randn(6, 6) * 0.02
        S = jnp.asarray(A @ A.T + 1e-4 * np.eye(6), jnp.float32)
        L = np.linalg.cholesky(np.asarray(S, np.float64))
        xs = jnp.asarray((L @ rng.randn(6, 4000)).T, jnp.float32)

        def sample(e):
            Zi = se3.inverse(se3.compose(Z, se3.se3_exp(e)))
            return se3.se3_log(se3.relative(se3.inverse(Z), Zi))

        d = jax.vmap(sample)(xs)
        emp = np.cov(np.asarray(d).T)
        ana = np.asarray(marg.inverse_covariance(Z, S), np.float64)
        err = np.linalg.norm(emp - ana) / np.linalg.norm(ana)
        assert err < 0.15, err


def _mk_store(poses: Pose, capacity: int, n_pts: int = 8) -> kf.KeyframeStore:
    store = kf.empty(capacity, n_pts)
    n = poses.t.shape[0]
    for i in range(n):
        cloud = pc.PointCloud(
            points=jnp.full((n_pts, 3), float(i)), mask=jnp.ones((n_pts,), bool)
        )
        store, _ = kf.add(
            store, se3.index(poses, i), se3.index(poses, i), cloud,
            jnp.asarray(float(i)), cov=0.01 * jnp.eye(6),
        )
    return store


def _chain_poses(n, step=1.0):
    t = np.zeros((n, 3), np.float32)
    t[:, 0] = np.arange(n) * step
    return Pose(t=jnp.asarray(t), q=se3.identity((n,)).q)


def _chain_edges(poses: Pose, capacity: int, info=100.0):
    edges = pg.empty_edges(capacity)
    n = poses.t.shape[0]
    for k in range(n - 1):
        rel = se3.relative(se3.index(poses, k), se3.index(poses, k + 1))
        edges = pg.add_edge(edges, k, k + 1, rel, info * jnp.eye(6))
    return edges


class TestMarginalizeKeyframe:
    def test_chain_solution_identical(self):
        """Exact chain: removing a middle node leaves the optimized
        solution of the remaining nodes unchanged (edge composition is
        exact when measurements are consistent)."""
        poses = _chain_poses(6)
        store = _mk_store(poses, 8)
        edges = _chain_edges(poses, 16)
        v = 3
        store2, edges2 = marg.marginalize_keyframe(store, edges, v)
        assert int(store2.count) == 5
        assert int(store2.evictions) == 1
        # composed chain: optimize and compare against ground truth minus
        # the removed node
        mask = store2.valid_mask()
        opt, _ = pg.optimize(store2.pose_graph, edges2, mask, iterations=5)
        keep = [0, 1, 2, 4, 5]
        np.testing.assert_allclose(
            np.asarray(opt.t[:5]), np.asarray(poses.t)[keep], atol=1e-3
        )

    def test_hop_edge_dropped_chain_preserved(self):
        poses = _chain_poses(5)
        store = _mk_store(poses, 8)
        edges = _chain_edges(poses, 16)
        store2, edges2 = marg.marginalize_keyframe(store, edges, 2)
        E = int(edges2.count)
        assert E == int(edges.count) - 1  # hop edge gone, others rehomed
        i = np.asarray(edges2.i)[:E]
        j = np.asarray(edges2.j)[:E]
        v = np.asarray(edges2.valid)[:E]
        assert v.all()
        # sequential chain over the compacted indices must be complete
        pairs = set(zip(i.tolist(), j.tolist()))
        assert pairs == {(0, 1), (1, 2), (2, 3)}
        # composed edge (1 -> 2 old index 3) spans two meters
        kidx = [k for k in range(E) if (i[k], j[k]) == (1, 2)][0]
        np.testing.assert_allclose(
            np.asarray(edges2.rel_t)[kidx], [2.0, 0.0, 0.0], atol=1e-5
        )
        # its information is the composition of two hops: covariance sums
        # (with lever-arm rotation/translation coupling over the 1 m hop),
        # so the composed info diagonal sits near half a single hop's
        d = np.diag(np.asarray(edges2.info)[kidx])
        assert np.all(d <= 60.0 + 1e-3) and np.all(d >= 35.0), d

    def test_loop_edge_rehomed(self):
        poses = _chain_poses(6)
        store = _mk_store(poses, 8)
        edges = _chain_edges(poses, 16)
        # loop edge 0 -> 4
        rel = se3.relative(se3.index(poses, 0), se3.index(poses, 4))
        edges = pg.add_edge(edges, 0, 4, rel, 100.0 * jnp.eye(6))
        store2, edges2 = marg.marginalize_keyframe(store, edges, 4)
        E = int(edges2.count)
        i = np.asarray(edges2.i)[:E]
        j = np.asarray(edges2.j)[:E]
        # the loop edge now ends at the predecessor (old 3, same index 3)
        pairs = list(zip(i.tolist(), j.tolist()))
        assert (0, 3) in pairs
        kidx = pairs.index((0, 3))
        np.testing.assert_allclose(
            np.asarray(edges2.rel_t)[kidx], [3.0, 0.0, 0.0], atol=1e-5
        )
        # re-homed through an uncertain hop: information must not grow
        d = np.diag(np.asarray(edges2.info)[kidx])
        assert np.all(d < 100.0 + 1e-3)

    def test_store_compaction_and_clouds(self):
        poses = _chain_poses(5)
        store = _mk_store(poses, 8)
        edges = _chain_edges(poses, 16)
        store2, _ = marg.marginalize_keyframe(store, edges, 2)
        # clouds shifted down: slot 2 now holds old keyframe 3's cloud
        assert float(store2.points[2, 0, 0]) == 3.0
        assert float(store2.stamp[2]) == 3.0
        np.testing.assert_allclose(
            np.asarray(store2.pose_graph.t[:4, 0]), [0.0, 1.0, 3.0, 4.0]
        )


class TestSelectVictim:
    def test_protections_and_redundancy(self):
        # nodes 0..9; node 3 is nearly coincident with its neighbors
        t = np.arange(10, dtype=np.float32)[:, None] * [1.0, 0.0, 0.0]
        t[3] = [2.1, 0.0, 0.0]
        poses = Pose(t=jnp.asarray(t), q=se3.identity((10,)).q)
        store = _mk_store(poses, 10)
        edges = _chain_edges(poses, 32)
        v = int(marg.select_victim(store, edges, protect_recent=3))
        # either side of the near-coincident pair is the redundant pick
        assert v in (2, 3)
        # loop-anchoring BOTH nodes of the pair passes them over
        for anchor in (2, 3):
            edges = pg.add_edge(
                edges, 0, anchor,
                se3.relative(se3.index(poses, 0), se3.index(poses, anchor)),
                100.0 * jnp.eye(6),
            )
        v2 = int(marg.select_victim(store, edges, protect_recent=3))
        assert v2 not in (2, 3) and 1 <= v2 <= 6

    def test_never_picks_gauge_or_recent(self):
        poses = _chain_poses(6)
        store = _mk_store(poses, 6)
        edges = _chain_edges(poses, 16)
        for _ in range(5):
            v = int(marg.select_victim(store, edges, protect_recent=2))
            assert 1 <= v <= 3


class TestSlamIntegration:
    def test_mission_outlives_capacity(self):
        """A run that wants ~3x max_keyframes keeps adding keyframes (and
        keeps tracking) instead of freezing — evictions counted."""
        from icpslam_tpu.config import tiny_config
        from icpslam_tpu.io import synthetic
        from icpslam_tpu.pipeline import slam

        cfg = tiny_config(
            max_keyframes=12,
            max_edges=64,
            keyframe_distance=0.25,
            keyframe_protect_recent=4,
            max_raw_points=4096,
            max_points=1024,
            max_map_points=8192,
        )
        world = synthetic.make_room_world(seed=0, n_points=20000)
        gt = synthetic.make_loop_trajectory(n_poses=50, radius=5.0, laps=1.25)
        scans = synthetic.scan_stream(
            world, gt, capacity=cfg.max_raw_points, max_range=12.0,
            n_points=1500, noise=0.01,
        )
        step = jax.jit(slam.slam_step, static_argnums=(2,))
        state = slam.init_state(cfg, se3.index(gt, 0))
        n_kf_events = 0
        for cloud in scans:
            state, out = step(state, cloud, cfg)
            n_kf_events += int(out.new_keyframe)
        assert int(state.keyframes.evictions) > 0
        assert n_kf_events > cfg.max_keyframes  # kept adding past capacity
        assert int(state.keyframes.count) == cfg.max_keyframes
        # tracking stayed alive: final pose finite and near the loop
        assert np.all(np.isfinite(np.asarray(state.slam_pose.t)))
        # edge store stays a valid prefix
        E = int(state.edges.count)
        assert bool(np.all(np.asarray(state.edges.valid)[:E]))
        assert not bool(np.any(np.asarray(state.edges.valid)[E:]))

    def test_eviction_beats_frozen_store(self):
        """With eviction the post-capacity trajectory should be no worse
        than the frozen-store behavior."""
        from icpslam_tpu.config import tiny_config
        from icpslam_tpu.eval import metrics
        from icpslam_tpu.io import synthetic
        from icpslam_tpu.pipeline import slam

        world = synthetic.make_room_world(seed=1, n_points=20000)
        gt = synthetic.make_loop_trajectory(n_poses=60, radius=5.0, laps=1.5)

        def run(eviction):
            cfg = tiny_config(
                max_keyframes=10,
                max_edges=64,
                keyframe_distance=0.25,
                keyframe_protect_recent=4,
                keyframe_eviction=eviction,
                max_raw_points=4096,
                max_points=1024,
                max_map_points=8192,
            )
            scans = synthetic.scan_stream(
                world, gt, capacity=cfg.max_raw_points, max_range=12.0,
                n_points=1500, noise=0.01,
            )
            step = jax.jit(slam.slam_step, static_argnums=(2,))
            state = slam.init_state(cfg, se3.index(gt, 0))
            traj = []
            for cloud in scans:
                state, out = step(state, cloud, cfg)
                traj.append(out.pose_map)
            ate, _ = metrics.ate(se3.stack(traj), gt, align=True)
            return ate, state

        ate_evict, st_e = run("marginalize")
        ate_frozen, st_f = run("none")
        assert int(st_e.keyframes.evictions) > 0
        assert int(st_f.keyframes.evictions) == 0
        assert np.isfinite(ate_evict)
        # eviction must not be catastrophically worse; typically better
        assert ate_evict <= ate_frozen * 1.5 + 0.05, (ate_evict, ate_frozen)


class TestCheckpointCompat:
    def test_old_checkpoint_missing_leaf_defaults(self, tmp_path):
        """A checkpoint written before a state leaf existed loads with the
        template default + a warning (ADVICE r4: format growth)."""
        import warnings

        from icpslam_tpu.config import tiny_config
        from icpslam_tpu.pipeline import slam
        from icpslam_tpu.utils import checkpoint

        cfg = tiny_config()
        state = slam.init_state(cfg)
        path = str(tmp_path / "old.npz")
        checkpoint.save(path, state)
        # simulate an old checkpoint: strip the evictions leaf
        data = dict(np.load(path))
        drop = [k for k in data if "evictions" in k]
        assert drop, "expected an evictions leaf in the checkpoint"
        for k in drop:
            del data[k]
        np.savez_compressed(path, **data)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            loaded = checkpoint.load(path, slam.init_state(cfg))
        assert any("predates" in str(x.message) for x in w)
        assert int(loaded.keyframes.evictions) == 0


class TestEdgeFusion:
    def test_fuse_parallel_pair_info_weighted(self):
        edges = pg.empty_edges(16)
        rel_a = Pose(t=jnp.asarray([1.0, 0.0, 0.0]), q=se3.identity().q)
        rel_b = Pose(t=jnp.asarray([1.2, 0.0, 0.0]), q=se3.identity().q)
        edges = pg.add_edge(edges, 1, 2, rel_a, 300.0 * jnp.eye(6))
        edges = pg.add_edge(edges, 0, 1, rel_a, 100.0 * jnp.eye(6))
        edges = pg.add_edge(edges, 1, 2, rel_b, 100.0 * jnp.eye(6))
        fused = marg.fuse_duplicate_edges(edges)
        E = int(fused.count)
        assert E == 2
        i = np.asarray(fused.i)[:E].tolist()
        j = np.asarray(fused.j)[:E].tolist()
        pairs = list(zip(i, j))
        assert set(pairs) == {(0, 1), (1, 2)}
        k = pairs.index((1, 2))
        # info summed; rel pulled 1/4 of the way toward the weaker edge
        d = np.diag(np.asarray(fused.info)[k])
        np.testing.assert_allclose(d, 400.0, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(fused.rel_t)[k], [1.05, 0.0, 0.0], atol=1e-5
        )
        # untouched edge intact
        k2 = pairs.index((0, 1))
        np.testing.assert_allclose(np.asarray(fused.rel_t)[k2], [1.0, 0, 0],
                                   atol=1e-6)

    def test_run_of_three_fuses_over_passes(self):
        edges = pg.empty_edges(16)
        rel = Pose(t=jnp.asarray([1.0, 0.0, 0.0]), q=se3.identity().q)
        for _ in range(3):
            edges = pg.add_edge(edges, 2, 5, rel, 100.0 * jnp.eye(6))
        once = marg.fuse_duplicate_edges(edges)
        assert int(once.count) == 2
        twice = marg.fuse_duplicate_edges(once)
        assert int(twice.count) == 1
        np.testing.assert_allclose(
            np.diag(np.asarray(twice.info)[0]), 300.0, rtol=1e-5
        )

    def test_marginalize_fuses_rehomed_duplicates(self):
        """Evicting v re-homes a loop edge (x → v) onto (x → p); if an
        (x → p) edge already exists the two fuse instead of hoarding a
        slot."""
        poses = _chain_poses(6)
        store = _mk_store(poses, 8)
        edges = _chain_edges(poses, 16)
        # loop edges 0→3 AND 0→4 (4's re-homes onto 0→3 after eviction)
        for tgt in (3, 4):
            rel = se3.relative(se3.index(poses, 0), se3.index(poses, tgt))
            edges = pg.add_edge(edges, 0, tgt, rel, 100.0 * jnp.eye(6))
        n_before = int(edges.count)
        store2, edges2 = marg.marginalize_keyframe(store, edges, 4)
        E = int(edges2.count)
        # hop edge dropped AND the re-homed duplicate fused: -2
        assert E == n_before - 2
        pairs = set(zip(np.asarray(edges2.i)[:E].tolist(),
                        np.asarray(edges2.j)[:E].tolist()))
        assert (0, 3) in pairs and len(pairs) == E
