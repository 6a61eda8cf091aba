"""Pallas fused-NN kernel correctness (interpreter mode on CPU; the same
kernel runs compiled on TPU where it is ~20x faster than the XLA path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from icpslam_tpu.ops import nn as nn_ops
from icpslam_tpu.ops.pallas.nn_kernel import (
    nearest_neighbors_pallas,
    nearest_neighbors_pallas3,
)

KERNELS = [nearest_neighbors_pallas, nearest_neighbors_pallas3]
IDS = ["v1-matmul", "v3-vpu"]


@pytest.mark.parametrize("kernel", KERNELS, ids=IDS)
class TestPallasNN:
    def test_matches_xla_path(self, kernel):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(512, 3), jnp.float32)
        t = jnp.asarray(rng.randn(512, 3), jnp.float32)
        tm = jnp.asarray(rng.rand(512) > 0.2)
        ref = nn_ops.nearest_neighbors(q, t, tm, use_pallas=False)
        got = kernel(q, t, tm, bq=256, bt=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))
        np.testing.assert_allclose(
            np.asarray(got.dist2), np.asarray(ref.dist2), atol=1e-4
        )

    def test_far_from_origin(self, kernel):
        # map frames drift arbitrarily far from the origin; selection must
        # not degrade (the historic bf16-truncation + cancellation trap)
        rng = np.random.RandomState(11)
        q64 = rng.randn(512, 3) * 5 + 300.0
        t64 = rng.randn(512, 3) * 5 + 300.0
        q = jnp.asarray(q64, jnp.float32)
        t = jnp.asarray(t64, jnp.float32)
        d = ((np.asarray(q, np.float64)[:, None] - np.asarray(t, np.float64)[None]) ** 2).sum(-1)
        got = kernel(q, t, jnp.ones(512, bool), bq=256, bt=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(got.idx), d.argmin(1))

    def test_all_masked_targets(self, kernel):
        q = jnp.zeros((256, 3))
        t = jnp.ones((128, 3))
        got = kernel(q, t, jnp.zeros(128, bool), bq=256, bt=128, interpret=True)
        assert np.all(np.isinf(np.asarray(got.dist2)))

    def test_valid_len_prefix_matches_masked(self, kernel):
        # a prefix-filled buffer with valid_len must give the same result
        # as masking alone (and skip the dead tiles on real hardware)
        rng = np.random.RandomState(7)
        q = jnp.asarray(rng.randn(256, 3), jnp.float32)
        t = jnp.asarray(rng.randn(512, 3), jnp.float32)
        live = 200  # not tile-aligned on purpose
        tm = jnp.arange(512) < live
        ref = nn_ops.nearest_neighbors(q, t, tm, use_pallas=False)
        got = kernel(
            q, t, tm, valid_len=jnp.asarray(live, jnp.int32),
            bq=256, bt=128, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))
        np.testing.assert_allclose(
            np.asarray(got.dist2), np.asarray(ref.dist2), atol=1e-4
        )

    def test_valid_len_zero_all_inf(self, kernel):
        q = jnp.zeros((256, 3))
        t = jnp.ones((256, 3))
        got = kernel(
            q, t, jnp.zeros(256, bool), valid_len=jnp.asarray(0, jnp.int32),
            bq=256, bt=128, interpret=True,
        )
        assert np.all(np.isinf(np.asarray(got.dist2)))

    def test_aabb_skip_spatially_sorted(self, kernel):
        # voxel-key-sorted slabs: the AABB pruning + rotated tile visit
        # must still produce exact results (this layout maximizes skips)
        rng = np.random.RandomState(21)
        base = np.sort(rng.uniform(0, 40, 1024)).astype(np.float32)
        q = np.stack([base, rng.randn(1024).astype(np.float32),
                      rng.randn(1024).astype(np.float32)], -1)
        t = q + rng.randn(1024, 3).astype(np.float32) * 0.05
        t = t[np.argsort(t[:, 0])]
        qj, tj = jnp.asarray(q), jnp.asarray(t)
        tm = jnp.ones(1024, bool)
        ref = nn_ops.nearest_neighbors(qj, tj, tm, use_pallas=False)
        got = kernel(qj, tj, tm, bq=256, bt=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))
        np.testing.assert_allclose(
            np.asarray(got.dist2), np.asarray(ref.dist2), atol=1e-4
        )

    def test_aabb_skip_with_valid_len(self, kernel):
        # pruning + live-prefix skipping together
        rng = np.random.RandomState(22)
        q = np.sort(rng.uniform(0, 20, 512)).astype(np.float32)
        q = np.stack([q, np.zeros(512, np.float32), np.zeros(512, np.float32)], -1)
        t = np.concatenate([q[:384] + 0.01, np.zeros((128, 3), np.float32)])
        tm = jnp.arange(512) < 384
        qj, tj = jnp.asarray(q), jnp.asarray(t)
        ref = nn_ops.nearest_neighbors(qj, tj, tm, use_pallas=False)
        got = kernel(qj, tj, tm, valid_len=jnp.asarray(384), bq=256, bt=128,
                     interpret=True)
        np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))
        np.testing.assert_allclose(
            np.asarray(got.dist2), np.asarray(ref.dist2), atol=1e-4
        )

    def test_prune_beyond_exact_within_radius(self, kernel):
        from icpslam_tpu.ops.pallas.nn_kernel import nearest_neighbors_pallas3
        if kernel is not nearest_neighbors_pallas3:
            pytest.skip("prune_beyond is a v3 feature")
        rng = np.random.RandomState(30)
        t = np.sort(rng.uniform(0, 10, 512)).astype(np.float32)
        t = np.stack([t, np.zeros(512, np.float32), np.zeros(512, np.float32)], -1)
        # near queries (true NN well inside the radius) + far outliers
        qn = t[::2] + 0.01
        qf = qn.copy(); qf[:, 0] += 500.0  # hopeless outliers
        q = np.concatenate([qn, qf])
        qj, tj = jnp.asarray(q), jnp.asarray(t)
        tm = jnp.ones(512, bool)
        # f64 brute force: the XLA matmul-form path itself loses the
        # ~1e-4-scale distance discrimination once the outliers drag the
        # centering far from the near cluster — the subtraction-form
        # kernel does not (that asymmetry is the point of the v3 kernel)
        d2f = ((q.astype(np.float64)[:, None]
                - t.astype(np.float64)[None]) ** 2).sum(-1)
        got = kernel(qj, tj, tm, bq=256, bt=128, interpret=True,
                     prune_beyond=1.0)
        n = len(qn)
        # within the radius: exact
        np.testing.assert_array_equal(
            np.asarray(got.idx[:n]), d2f[:n].argmin(1))
        np.testing.assert_allclose(
            np.asarray(got.dist2[:n]), d2f[:n].min(1), atol=1e-5)
        # outliers: either inf or some d2 beyond the radius — never a
        # spurious within-radius match
        d2f = np.asarray(got.dist2[n:])
        assert np.all(~np.isfinite(d2f) | (d2f > 1.0))

    def test_indivisible_raises(self, kernel):
        with pytest.raises(ValueError):
            kernel(
                jnp.zeros((100, 3)), jnp.zeros((128, 3)), jnp.ones(128, bool),
                interpret=True,
            )

def test_dispatcher_fallback_on_cpu():
    # on CPU the dispatcher must take the XLA path silently
    q = jnp.zeros((256, 3))
    t = jnp.ones((512, 3))
    res = nn_ops.nearest_neighbors(q, t, jnp.ones(512, bool))
    assert res.idx.shape == (256,)


class TestPallasKNN:
    def test_matches_bruteforce(self):
        from icpslam_tpu.ops.pallas.nn_kernel import knn_pallas
        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.randn(256, 3), jnp.float32)
        t = jnp.asarray(rng.randn(256, 3), jnp.float32)
        tm = jnp.asarray(rng.rand(256) > 0.1)
        idx, d2 = knn_pallas(q, t, tm, k=5, bq=256, bt=128, interpret=True)
        d_full = ((np.asarray(q)[:, None] - np.asarray(t)[None]) ** 2).sum(-1)
        d_full[:, ~np.asarray(tm)] = np.inf
        np.testing.assert_array_equal(
            np.asarray(idx), np.argsort(d_full, axis=1)[:, :5]
        )
        np.testing.assert_allclose(
            np.asarray(d2), np.sort(d_full, axis=1)[:, :5], atol=1e-4
        )

    def test_fewer_valid_than_k(self):
        from icpslam_tpu.ops.pallas.nn_kernel import knn_pallas
        q = jnp.zeros((256, 3))
        t = jnp.ones((128, 3))
        tm = jnp.zeros(128, bool).at[0].set(True).at[1].set(True)
        idx, d2 = knn_pallas(q, t, tm, k=4, bq=256, bt=128, interpret=True)
        # only 2 valid targets → trailing neighbors are inf
        assert np.all(np.isfinite(np.asarray(d2)[:, :2]))
        assert np.all(np.isinf(np.asarray(d2)[:, 2:]))
