"""Per-point surface covariances for GICP (plane-to-plane) registration.

PCL's GICP estimates a covariance from each point's k nearest neighbors and
regularizes its eigenvalues to ``(1, 1, ε)`` — treating every local surface
patch as a disk (GICP, Segal et al.). The TPU formulation computes all
covariances at once: blocked k-NN (MXU matmuls) → neighbor gather →
batched 3×3 eigendecomposition → eigenvalue replacement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icpslam_tpu.cloud.pointcloud import PointCloud
from icpslam_tpu.ops import nn as nn_ops
from icpslam_tpu.ops.linalg3 import smallest_eigenvector_sym3


def gicp_covariances(
    cloud: PointCloud,
    k: int = 10,
    epsilon: float = 1e-3,
    block: int = 512,
    approx: bool = True,
) -> jnp.ndarray:
    """GICP-regularized covariances (N, 3, 3) for every point in the cloud.

    Key identity exploited for speed: the GICP regularization
    ``U diag(ε,1,1) Uᵀ`` depends only on the surface normal n (the
    smallest eigenvector), since it equals ``I − (1−ε)·n nᵀ``. The normal
    comes from a closed-form symmetric-3×3 eigen-solve (``ops.linalg3``) —
    no LAPACK ``eigh`` in the per-scan hot path — and neighbor search uses
    the TPU-native ``approx_max_k`` by default (exact top-k when
    ``approx=False``).

    Padding points get identity covariances (they are masked out of the
    registration cost anyway).
    """
    pts = cloud.points
    idx, d2 = nn_ops.knn(pts, pts, cloud.mask, k=k, block=block, approx=approx)
    valid = jnp.isfinite(d2)  # (N, k): False when < k valid neighbors

    neigh = pts[idx]  # (N, k, 3)
    w = valid.astype(pts.dtype)
    count = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)  # (N, 1)
    mean = jnp.sum(neigh * w[..., None], axis=-2) / count
    centered = (neigh - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / count[..., None]

    # Regularized covariance I − (1−ε) n nᵀ from the patch normal.
    normal = smallest_eigenvector_sym3(cov)
    eye = jnp.eye(3, dtype=pts.dtype)
    cov_reg = eye - (1.0 - epsilon) * jnp.einsum("ni,nj->nij", normal, normal)

    # Degenerate points (too few neighbors) → identity covariance.
    enough = jnp.sum(valid, axis=-1) >= 3
    cov_reg = jnp.where(enough[:, None, None] & cloud.mask[:, None, None], cov_reg, eye)
    return cov_reg


def gicp_covariances_radius(
    cloud: PointCloud,
    radius: float,
    epsilon: float = 1e-3,
    sigma: float = 0.0,
) -> jnp.ndarray:
    """GICP covariances from *fixed-radius* neighborhoods — no top-k.

    The neighborhood covariance is recovered from moment statistics
    (count, Σp, Σppᵀ) accumulated in a single fused Pallas pass
    (``ops.pallas.radius_stats_kernel``); the surface normal and the
    ``I − (1−ε)·n nᵀ`` regularization follow as in the k-NN variant. On
    voxel-downsampled clouds a radius of ~2-3 leaf sizes yields the same
    ~10-20 neighbors PCL's k-NN would find, at a fraction of the cost.

    ``sigma > 0`` applies a Gaussian distance taper inside the radius
    (still one fused pass) — near neighbors dominate the normal estimate
    like in kNN mode, removing the hard-cutoff noise of the plain radius
    weight at no extra memory traffic.
    """
    from icpslam_tpu.ops.pallas import radius_stats_kernel as rsk

    pts = cloud.points
    use_pallas = (
        jax.default_backend() == "tpu"
        and pts.shape[0] % rsk.DEFAULT_BQ == 0
        and pts.shape[0] % rsk.DEFAULT_BT == 0
    )
    fn = rsk.radius_moments if use_pallas else rsk.radius_moments_xla
    count, _, cov = fn(pts, pts, cloud.mask, radius, sigma=sigma)

    normal = smallest_eigenvector_sym3(cov)
    eye = jnp.eye(3, dtype=pts.dtype)
    cov_reg = eye - (1.0 - epsilon) * jnp.einsum("ni,nj->nij", normal, normal)
    # need ≥3 neighbors (the point itself is always in-radius; with a
    # Gaussian taper `count` is the effective weight sum Σw, so the
    # equivalent threshold is lower — the self-weight alone is 1)
    enough = count >= (2.0 if sigma > 0 else 3.0)
    return jnp.where(enough[:, None, None] & cloud.mask[:, None, None], cov_reg, eye)
