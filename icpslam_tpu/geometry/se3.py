"""Batched SE(3) poses as a functional pytree.

``Pose`` replaces the reference's mutable ``Pose6DOF`` class
(``/root/reference/include/utils/pose6DOF.h:15-126``,
``/root/reference/src/utils/pose6DOF.cpp:98-131``) with an immutable
NamedTuple of ``t`` (..., 3) translation and ``q`` (..., 4) wxyz unit
quaternion. Covariance is carried separately where needed (graph edges)
rather than inside every pose.

Semantics intentionally *fixed* relative to the reference's quirks
(SURVEY.md §7.4): ``compose`` is the standard group product
``T1·T2 = (R1 t2 + t1, q1⊗q2)`` (same as ``Pose6DOF::compose``,
``pose6DOF.cpp:98-105``), and ``relative(a, b) = a⁻¹ ∘ b`` — the
mathematically consistent version of the reference's inconsistent
``subtract`` (``pose6DOF.cpp:107-115`` mixes frames for rotation vs
translation; we do not replicate that).

Also provides so(3)/se(3) exp/log maps with small-angle Taylor guards —
needed by the Gauss-Newton pose-graph solver and ICP update steps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from icpslam_tpu.geometry import quaternion as quat

_EPS = 1e-8


class Pose(NamedTuple):
    """SE(3) pose: world-from-body. Broadcasts over leading axes."""

    t: jnp.ndarray  # (..., 3) translation
    q: jnp.ndarray  # (..., 4) unit quaternion, wxyz

    @property
    def batch_shape(self):
        return self.t.shape[:-1]

    def as_matrix(self) -> jnp.ndarray:
        """Homogeneous 4x4 matrix (..., 4, 4)."""
        R = quat.to_matrix(self.q)
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
        return jnp.concatenate([top, bottom], axis=-2)


def identity(shape=(), dtype=jnp.float32) -> Pose:
    return Pose(
        t=jnp.zeros(tuple(shape) + (3,), dtype=dtype),
        q=quat.identity(shape, dtype=dtype),
    )


def from_matrix(m: jnp.ndarray) -> Pose:
    return Pose(t=m[..., :3, 3], q=quat.from_matrix(m[..., :3, :3]))


def compose(a: Pose, b: Pose) -> Pose:
    """Group product a ∘ b: apply b in a's frame."""
    return Pose(t=a.t + quat.rotate(a.q, b.t), q=quat.multiply(a.q, b.q))


def inverse(a: Pose) -> Pose:
    qi = quat.conjugate(a.q)
    return Pose(t=-quat.rotate(qi, a.t), q=qi)


def relative(a: Pose, b: Pose) -> Pose:
    """a⁻¹ ∘ b: pose of b expressed in a's frame."""
    return compose(inverse(a), b)


def transform_points(p: Pose, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to points ``(..., N, 3)`` (pose broadcasts over N)."""
    return quat.rotate(p.q[..., None, :], pts) + p.t[..., None, :]


def distance_translation(a: Pose, b: Pose) -> jnp.ndarray:
    """Euclidean distance between positions — the reference's keyframe /
    pose gate metric (``pose6DOF.cpp:94-96``)."""
    return jnp.linalg.norm(a.t - b.t, axis=-1)


def distance_rotation(a: Pose, b: Pose) -> jnp.ndarray:
    """Absolute relative rotation angle in radians."""
    return quat.angle(quat.multiply(quat.conjugate(a.q), b.q))


def normalize(a: Pose) -> Pose:
    """Re-normalize the quaternion (drift control after long compositions)."""
    return Pose(t=a.t, q=quat.normalize(a.q))


# ----------------------------------------------------------------------------
# so(3) / se(3) exp and log maps (batched, Taylor-guarded)
# ----------------------------------------------------------------------------


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector (..., 3) → unit quaternion (..., 4).

    Differentiation-safe at w = 0 (double-where: the dangerous ``sqrt`` is
    applied to a guarded operand so forward-mode tangents stay finite —
    required by the pose-graph solver's ``jacfwd`` at zero perturbations).
    """
    n2 = jnp.sum(w * w, axis=-1, keepdims=True)
    small = n2 < 1e-12
    theta = jnp.sqrt(jnp.where(small, 1.0, n2))
    half = 0.5 * theta
    qw = jnp.where(small, 1.0 - n2 / 8.0, jnp.cos(half))
    scale = jnp.where(small, 0.5 - n2 / 48.0, jnp.sin(half) / theta)
    return jnp.concatenate([qw, scale * w], axis=-1)


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion → rotation vector (..., 3), angle in [0, pi].

    Differentiation-safe at the identity quaternion (double-where guards).
    """
    q = jnp.where(q[..., :1] < 0, -q, q)  # shortest arc
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    xyz = q[..., 1:]
    n2 = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    small = n2 < 1e-12
    n = jnp.sqrt(jnp.where(small, 1.0, n2))
    theta = 2.0 * jnp.arctan2(n, w)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / n)
    return scale * xyz


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix (..., 3, 3) of vector(s) (..., 3)."""
    return _skew(v)


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def _so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3) at rotation vector w, (..., 3, 3).

    Differentiation-safe at w = 0 (guarded sqrt/denominators).
    """
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    small = theta2 < 1e-8
    t2 = jnp.where(small, 1.0, theta2)
    t = jnp.sqrt(t2)
    W = _skew(w)
    W2 = W @ W
    A = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(t)) / t2)
    B = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (t - jnp.sin(t)) / (t2 * t))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * W2


def _so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    small = theta2 < 1e-8
    t2 = jnp.where(small, 1.0, theta2)
    t = jnp.sqrt(t2)
    W = _skew(w)
    W2 = W @ W
    half_t = 0.5 * t
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_t * jnp.cos(half_t) / jnp.sin(half_t)) / t2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term * W2


def se3_exp(xi: jnp.ndarray) -> Pose:
    """Twist (..., 6) = [rho(3), w(3)] → Pose. t = J_l(w) @ rho."""
    rho, w = xi[..., :3], xi[..., 3:]
    q = so3_exp(w)
    t = (_so3_left_jacobian(w) @ rho[..., :, None])[..., 0]
    return Pose(t=t, q=q)


def se3_log(p: Pose) -> jnp.ndarray:
    """Pose → twist (..., 6) = [rho, w] with exp(log(p)) == p."""
    w = so3_log(p.q)
    rho = (_so3_left_jacobian_inv(w) @ p.t[..., :, None])[..., 0]
    return jnp.concatenate([rho, w], axis=-1)


def _se3_Q(xi: jnp.ndarray) -> jnp.ndarray:
    """Barfoot's Q(ξ) matrix — the off-diagonal block of the SE(3) left
    Jacobian at ξ = [ρ, φ] (..., 6) → (..., 3, 3). Taylor-guarded."""
    rho, phi = xi[..., :3], xi[..., 3:]
    P = _skew(rho)
    W = _skew(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta2 < 1e-8
    t2 = jnp.where(small, 1.0, theta2)
    t = jnp.sqrt(t2)
    # c1 = (θ−sinθ)/θ³ ; c2 = (1−θ²/2−cosθ)/θ⁴ ; c3 = (θ−sinθ−θ³/6)/θ⁵
    c1 = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (t - jnp.sin(t)) / (t2 * t))
    c2 = jnp.where(
        small,
        -1.0 / 24.0 + theta2 / 720.0,
        (1.0 - theta2 / 2.0 - jnp.cos(t)) / (t2 * t2),
    )
    c3 = jnp.where(
        small,
        -1.0 / 120.0 + theta2 / 5040.0,
        (t - jnp.sin(t) - t2 * t / 6.0) / (t2 * t2 * t),
    )
    WP = W @ P
    PW = P @ W
    WPW = WP @ W
    W2 = W @ W
    return (
        0.5 * P
        + c1 * (WP + PW + WPW)
        - c2 * (W2 @ P + P @ W2 - 3.0 * WPW)
        - 0.5 * (c2 - 3.0 * c3) * (WP @ W2 + W2 @ PW)
    )


def se3_left_jacobian_inv(xi: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian of SE(3) at twist ξ (..., 6) → (..., 6, 6).

    Jl⁻¹(ξ) = [[Jl⁻¹(φ), −Jl⁻¹(φ) Q(ξ) Jl⁻¹(φ)], [0, Jl⁻¹(φ)]].
    """
    phi = xi[..., 3:]
    Jli = _so3_left_jacobian_inv(phi)
    Q = _se3_Q(xi)
    top_right = -(Jli @ Q @ Jli)
    zero = jnp.zeros_like(Jli)
    top = jnp.concatenate([Jli, top_right], axis=-1)
    bottom = jnp.concatenate([zero, Jli], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_right_jacobian_inv(xi: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian: Jr⁻¹(ξ) = Jl⁻¹(−ξ)."""
    return se3_left_jacobian_inv(-xi)


def adjoint(p: Pose) -> jnp.ndarray:
    """Adjoint matrix (..., 6, 6) mapping twists between frames:
    Ad(T) @ xi satisfies T·exp(xi)·T⁻¹ = exp(Ad(T) xi)."""
    R = quat.to_matrix(p.q)
    tR = _skew(p.t) @ R
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def stack(poses) -> Pose:
    """Stack a python list of Pose into a batched Pose."""
    return Pose(
        t=jnp.stack([p.t for p in poses], axis=0),
        q=jnp.stack([p.q for p in poses], axis=0),
    )


def index(p: Pose, i) -> Pose:
    return Pose(t=p.t[i], q=p.q[i])
