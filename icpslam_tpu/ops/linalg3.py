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


def eigvals_sym3(A: jnp.ndarray) -> jnp.ndarray:
    """Analytic eigenvalues of symmetric (..., 3, 3), ascending (..., 3).

    Trigonometric Cardano solution — pure VPU elementwise math, orders of
    magnitude faster than LAPACK-style ``eigh`` for large batches of tiny
    matrices (the GICP covariance path runs this on every point).
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    small = p2 < 1e-20
    p = jnp.sqrt(jnp.where(small, 1.0, p2) / 6.0)
    pinv = jnp.where(small, 0.0, 1.0 / p)
    # det((A - qI)/p) / 2
    b00, b11, b22 = d0 * pinv, d1 * pinv, d2 * pinv
    b01, b02, b12 = a01 * pinv, a02 * pinv, a12 * pinv
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(0.5 * detB, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    # isotropic matrices (p2 ≈ 0) have all eigenvalues equal to q; the
    # guarded p above is a dummy there, so select q explicitly
    e_lo = jnp.where(small, q, e_lo)
    e_mid = jnp.where(small, q, e_mid)
    e_hi = jnp.where(small, q, e_hi)
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def smallest_eigenvector_sym3(
    A: jnp.ndarray, fallback: tuple = (0.0, 0.0, 1.0)
) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric (..., 3, 3).

    Null-space extraction via row cross products of ``A − λ_min I`` (the
    best-conditioned of the three row pairs). Near-isotropic matrices have
    no well-defined direction; those fall back to ``fallback`` — harmless
    for GICP, where an isotropic patch carries no plane constraint anyway.
    """
    lam = eigvals_sym3(A)[..., 0]
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    cands = jnp.stack([c01, c02, c12], axis=-2)  # (..., 3, 3)
    norms = jnp.linalg.norm(cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    ok = n[..., 0] > 1e-10
    fb = jnp.asarray(fallback, dtype=A.dtype)
    v = jnp.where(ok[..., None], v / jnp.where(ok[..., None], n, 1.0), fb)
    return v


def inv_sym3_comps(a, b, c, d, e, f, eps: float = 1e-12):
    """Inverse of symmetric ``[[a,b,c],[b,d,e],[c,e,f]]`` in component form.

    Operands and results are six same-shaped arrays (typically ``(N,)``) —
    the structure-of-arrays layout keeps every op on full 128-wide VPU
    lanes, instead of ``(N, 3, 3)`` tensors whose trailing dims get
    tile-padded to ``(8, 128)`` (~43x wasted HBM traffic in hot loops).
    Same det-clamp regularization as :func:`inv3`.
    """
    cof00 = d * f - e * e
    cof01 = c * e - b * f
    cof02 = b * e - c * d
    det = a * cof00 + b * cof01 + c * cof02
    det = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + (det == 0) * eps, det)
    inv_det = 1.0 / det
    return (
        cof00 * inv_det,
        cof01 * inv_det,
        cof02 * inv_det,
        (a * f - c * c) * inv_det,
        (b * c - a * e) * inv_det,
        (a * d - b * b) * inv_det,
    )


def rotate_sym3_comps(R: jnp.ndarray, comps):
    """``B = R C Rᵀ`` for symmetric C in component form (see above).

    ``R`` is a single (3, 3) rotation (scalar entries, unrolled at trace
    time); ``comps`` are the six (...,)-shaped components of C. Returns
    B's six components.
    """
    a, b, c, d, e, f = comps
    C = ((a, b, c), (b, d, e), (c, e, f))
    V = [
        [sum(R[i, k] * C[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]
    B = [
        [sum(V[i][k] * R[j, k] for k in range(3)) for j in range(3)]
        for i in (0, 1, 2)
    ]
    return B[0][0], B[0][1], B[0][2], B[1][1], B[1][2], B[2][2]


def sym3_comps(A: jnp.ndarray):
    """Split symmetric (..., 3, 3) into its six (...,) components."""
    return (
        A[..., 0, 0], A[..., 0, 1], A[..., 0, 2],
        A[..., 1, 1], A[..., 1, 2], A[..., 2, 2],
    )


def pack_sym3(A: jnp.ndarray) -> jnp.ndarray:
    """Pack symmetric (..., 3, 3) into (..., 6) as [xx, yy, zz, xy, xz, yz]."""
    return jnp.stack(
        [A[..., 0, 0], A[..., 1, 1], A[..., 2, 2],
         A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]],
        axis=-1,
    )


def unpack_sym3(p: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``pack_sym3``: (..., 6) → symmetric (..., 3, 3)."""
    xx, yy, zz, xy, xz, yz = (p[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
