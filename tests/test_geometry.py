"""Unit tests for batched quaternion / SE(3) algebra.

Mirrors the semantics checks the reference never had: compose/inverse/
relative round-trips (``pose6DOF.cpp:98-131``), matrix conversions, and
exp/log maps against closed forms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icpslam_tpu.geometry import quaternion as quat
from icpslam_tpu.geometry import se3
from icpslam_tpu.geometry.se3 import Pose


def random_quats(key, shape=()):
    q = jax.random.normal(key, tuple(shape) + (4,))
    return quat.normalize(q)


def random_poses(key, shape=()):
    k1, k2 = jax.random.split(key)
    return Pose(t=jax.random.normal(k1, tuple(shape) + (3,)), q=random_quats(k2, shape))


class TestQuaternion:
    def test_identity_rotate(self):
        v = jnp.array([1.0, 2.0, 3.0])
        out = quat.rotate(quat.identity(), v)
        np.testing.assert_allclose(out, v, atol=1e-6)

    def test_rotate_matches_matrix(self):
        key = jax.random.PRNGKey(0)
        q = random_quats(key, (16,))
        v = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
        r1 = quat.rotate(q, v)
        r2 = jnp.einsum("bij,bj->bi", quat.to_matrix(q), v)
        np.testing.assert_allclose(r1, r2, atol=1e-5)

    def test_multiply_matches_matrix_product(self):
        ka, kb = jax.random.split(jax.random.PRNGKey(2))
        a, b = random_quats(ka, (8,)), random_quats(kb, (8,))
        m1 = quat.to_matrix(quat.multiply(a, b))
        m2 = quat.to_matrix(a) @ quat.to_matrix(b)
        np.testing.assert_allclose(m1, m2, atol=1e-5)

    def test_from_matrix_roundtrip(self):
        q = random_quats(jax.random.PRNGKey(3), (64,))
        q_rt = quat.from_matrix(quat.to_matrix(q))
        # q and -q are the same rotation; from_matrix canonicalizes w >= 0
        q_canon = jnp.where(q[..., :1] < 0, -q, q)
        np.testing.assert_allclose(q_rt, q_canon, atol=1e-5)

    def test_from_matrix_near_degenerate(self):
        # 180-degree rotations hit every branch of Shepperd's method
        for axis in np.eye(3):
            q = quat.from_axis_angle(jnp.asarray(axis, jnp.float32), jnp.asarray(np.pi, jnp.float32))
            m = quat.to_matrix(q)
            q_rt = quat.from_matrix(m)
            np.testing.assert_allclose(quat.to_matrix(q_rt), m, atol=1e-5)

    def test_conjugate_is_inverse(self):
        q = random_quats(jax.random.PRNGKey(4), (8,))
        prod = quat.multiply(q, quat.conjugate(q))
        np.testing.assert_allclose(prod, np.tile([1, 0, 0, 0], (8, 1)), atol=1e-5)

    def test_rpy_roundtrip(self):
        rpy = (0.3, -0.2, 1.1)
        q = quat.from_rpy(*rpy)
        out = quat.to_rpy(q)
        np.testing.assert_allclose(np.array(out), np.array(rpy), atol=1e-5)

    def test_axis_angle(self):
        q = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.array(np.pi / 2))
        v = quat.rotate(q, jnp.array([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(quat.angle(q), np.pi / 2, atol=1e-6)


class TestPose:
    def test_compose_identity(self):
        p = random_poses(jax.random.PRNGKey(5), (4,))
        out = se3.compose(p, se3.identity((4,)))
        np.testing.assert_allclose(out.t, p.t, atol=1e-6)
        np.testing.assert_allclose(out.q, p.q, atol=1e-6)

    def test_compose_matches_matrix(self):
        ka, kb = jax.random.split(jax.random.PRNGKey(6))
        a, b = random_poses(ka, (8,)), random_poses(kb, (8,))
        m1 = se3.compose(a, b).as_matrix()
        m2 = a.as_matrix() @ b.as_matrix()
        np.testing.assert_allclose(m1, m2, atol=1e-5)

    def test_inverse_roundtrip(self):
        p = random_poses(jax.random.PRNGKey(7), (8,))
        ident = se3.compose(p, se3.inverse(p))
        np.testing.assert_allclose(ident.t, np.zeros((8, 3)), atol=1e-5)
        np.testing.assert_allclose(np.abs(ident.q[..., 0]), np.ones(8), atol=1e-5)

    def test_relative(self):
        ka, kb = jax.random.split(jax.random.PRNGKey(8))
        a, b = random_poses(ka), random_poses(kb)
        rel = se3.relative(a, b)
        b_rt = se3.compose(a, rel)
        np.testing.assert_allclose(b_rt.t, b.t, atol=1e-5)
        np.testing.assert_allclose(
            np.abs(np.sum(b_rt.q * b.q)), 1.0, atol=1e-5
        )

    def test_transform_points_matches_matrix(self):
        p = random_poses(jax.random.PRNGKey(9))
        pts = jax.random.normal(jax.random.PRNGKey(10), (32, 3))
        out = se3.transform_points(p, pts)
        hom = np.concatenate([pts, np.ones((32, 1))], axis=-1)
        expect = (np.asarray(p.as_matrix()) @ hom.T).T[:, :3]
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_matrix_roundtrip(self):
        p = random_poses(jax.random.PRNGKey(11), (8,))
        p_rt = se3.from_matrix(p.as_matrix())
        np.testing.assert_allclose(p_rt.t, p.t, atol=1e-5)
        np.testing.assert_allclose(
            np.abs(np.sum(p_rt.q * p.q, axis=-1)), np.ones(8), atol=1e-5
        )

    def test_distances(self):
        a = Pose(t=jnp.array([0.0, 0.0, 0.0]), q=quat.identity())
        b = Pose(
            t=jnp.array([3.0, 4.0, 0.0]),
            q=quat.from_axis_angle(jnp.array([1.0, 0.0, 0.0]), jnp.array(0.5)),
        )
        np.testing.assert_allclose(se3.distance_translation(a, b), 5.0, atol=1e-6)
        np.testing.assert_allclose(se3.distance_rotation(a, b), 0.5, atol=1e-5)


class TestLieMaps:
    def test_so3_exp_log_roundtrip(self):
        # roundtrip holds only inside the injectivity radius ||w|| < pi
        w = jax.random.normal(jax.random.PRNGKey(12), (32, 3))
        w = w / (1.0 + jnp.linalg.norm(w, axis=-1, keepdims=True)) * 3.0
        w_rt = se3.so3_log(se3.so3_exp(w))
        np.testing.assert_allclose(w_rt, w, atol=1e-4)

    def test_so3_exp_small_angle(self):
        w = jnp.array([[1e-10, 0, 0], [0.0, 0.0, 0.0]])
        q = se3.so3_exp(w)
        assert not np.any(np.isnan(q))
        np.testing.assert_allclose(q[1], [1, 0, 0, 0], atol=1e-7)

    def test_so3_exp_matches_axis_angle(self):
        axis = jnp.array([0.0, 1.0, 0.0])
        q1 = se3.so3_exp(axis * 0.7)
        q2 = quat.from_axis_angle(axis, jnp.array(0.7))
        np.testing.assert_allclose(q1, q2, atol=1e-6)

    def test_se3_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(13), (32, 6))
        # keep the rotation part inside the injectivity radius
        wn = jnp.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
        xi = xi.at[:, 3:].multiply(3.0 / (1.0 + wn))
        p = se3.se3_exp(xi)
        xi_rt = se3.se3_log(p)
        np.testing.assert_allclose(xi_rt, xi, atol=1e-4)

    def test_se3_log_exp_roundtrip(self):
        p = random_poses(jax.random.PRNGKey(14), (16,))
        p_rt = se3.se3_exp(se3.se3_log(p))
        np.testing.assert_allclose(p_rt.t, p.t, atol=1e-4)
        np.testing.assert_allclose(
            np.abs(np.sum(p_rt.q * p.q, axis=-1)), np.ones(16), atol=1e-5
        )

    def test_se3_exp_zero(self):
        p = se3.se3_exp(jnp.zeros(6))
        np.testing.assert_allclose(p.t, np.zeros(3), atol=1e-7)
        np.testing.assert_allclose(p.q, [1, 0, 0, 0], atol=1e-7)

    def test_adjoint(self):
        # T·exp(xi)·T⁻¹ == exp(Ad(T) xi)
        p = random_poses(jax.random.PRNGKey(15))
        xi = jax.random.normal(jax.random.PRNGKey(16), (6,)) * 0.3
        lhs = se3.compose(se3.compose(p, se3.se3_exp(xi)), se3.inverse(p))
        rhs = se3.se3_exp(se3.adjoint(p) @ xi)
        np.testing.assert_allclose(lhs.t, rhs.t, atol=1e-4)
        np.testing.assert_allclose(
            np.abs(np.sum(lhs.q * rhs.q)), 1.0, atol=1e-5
        )

    def test_jacfwd_safe_at_zero(self):
        # regression: forward-mode tangents of the Lie maps must stay finite
        # at the zero twist (the pose-graph solver differentiates there)
        J = jax.jacfwd(lambda d: se3.se3_log(se3.compose(se3.se3_exp(d), se3.identity())))(
            jnp.zeros(6)
        )
        assert not np.any(np.isnan(np.asarray(J)))
        np.testing.assert_allclose(np.asarray(J), np.eye(6), atol=1e-5)

    def test_jit_and_vmap(self):
        # the whole layer must be jit/vmap friendly
        f = jax.jit(lambda a, b: se3.se3_log(se3.relative(a, b)))
        a = random_poses(jax.random.PRNGKey(17), (8,))
        b = random_poses(jax.random.PRNGKey(18), (8,))
        out = f(a, b)
        assert out.shape == (8, 6)
        assert not np.any(np.isnan(out))
