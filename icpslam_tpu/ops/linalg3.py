"""Small batched linear algebra helpers (3x3 / 6x6) used by registration.

Closed-form adjugate inverses avoid calling general LAPACK-style kernels for
tiny matrices inside hot loops — everything maps onto the VPU elementwise
units and broadcasts over arbitrary leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def det3(m: jnp.ndarray) -> jnp.ndarray:
    """Determinant of (..., 3, 3)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def inv3(m: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Closed-form inverse of (..., 3, 3) via the adjugate.

    Singular inputs are regularized by clamping |det| away from zero; the
    caller is expected to have conditioned the matrices (e.g. GICP epsilon-
    inflated covariances are always invertible).
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + (det == 0) * eps, det)
    adj = jnp.stack([A, D, G, B, E, H, C, F, I], axis=-1).reshape(m.shape)
    return adj / det[..., None, None]


def solve_psd(H: jnp.ndarray, b: jnp.ndarray, damping: float = 0.0) -> jnp.ndarray:
    """Solve (H + damping*diag(H)) x = b for symmetric PSD H (..., n, n).

    Levenberg-style diagonal damping; uses Cholesky via jnp.linalg.solve
    (small n, batched fine on TPU).
    """
    n = H.shape[-1]
    eye = jnp.eye(n, dtype=H.dtype)
    if damping:
        diag = jnp.diagonal(H, axis1=-2, axis2=-1)
        H = H + damping * diag[..., None] * eye
    # tiny Tikhonov floor for numerical safety
    H = H + 1e-9 * eye
    return jnp.linalg.solve(H, b[..., None])[..., 0]


def symmetrize(m: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (m + jnp.swapaxes(m, -1, -2))
