"""Batched unit-quaternion algebra.

Convention: quaternions are stored ``(w, x, y, z)`` (scalar first), as
``(..., 4)`` float arrays. All functions broadcast over leading axes, so the
same code serves a single pose and a keyframe batch.

Replaces the Eigen/tf quaternion usage of the reference's ``Pose6DOF``
(``/root/reference/src/utils/pose6DOF.cpp``); semantics match Hamilton
quaternions with active rotations (``rotate(q, v) = R(q) @ v``).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    """Identity quaternion(s) of shape ``shape + (4,)``."""
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize to unit length, guarding the zero quaternion."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    safe = jnp.where(n > _EPS, n, 1.0)
    out = q / safe
    # A degenerate all-zero quaternion becomes identity instead of NaN.
    return jnp.where(n > _EPS, out, identity(q.shape[:-1], q.dtype))


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product ``a ⊗ b`` (apply ``b``'s rotation, then ``a``'s)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) ``v`` (..., 3) by quaternion(s) ``q`` (..., 4).

    Uses the two-cross-product form (cheaper than building the matrix):
    ``v + 2 w (u × v) + 2 u × (u × v)`` with ``u`` the vector part.
    """
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix ``(..., 3, 3)`` from unit quaternion."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion from rotation matrix, branch-free (Shepperd's method).

    Computes all four candidate quaternions (one per largest diagonal
    element hypothesis) and selects the numerically best with ``where`` —
    no data-dependent control flow, so it is jit/vmap friendly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four squared magnitudes: 4w², 4x², 4y², 4z²
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # Candidate quaternions scaled by their dominant component.
    cw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cw, cx, cy, cz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = normalize(q)
    # Canonicalize sign: w >= 0.
    return jnp.where(q[..., :1] < 0, -q, q)


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from (unit) axis ``(..., 3)`` and angle ``(...,)`` radians."""
    half = 0.5 * angle
    w = jnp.cos(half)[..., None]
    xyz = axis * jnp.sin(half)[..., None]
    return jnp.concatenate([w, xyz], axis=-1)


def from_rpy(roll, pitch, yaw) -> jnp.ndarray:
    """Quaternion from ZYX Euler angles (matches tf's setRPY)."""
    roll = jnp.asarray(roll)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def to_rpy(q: jnp.ndarray):
    """ZYX Euler angles (roll, pitch, yaw) from quaternion."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def angle(q: jnp.ndarray) -> jnp.ndarray:
    """Absolute rotation angle in [0, pi]."""
    w = jnp.clip(jnp.abs(q[..., 0]), 0.0, 1.0)
    return 2.0 * jnp.arccos(w)
