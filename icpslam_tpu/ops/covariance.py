"""Per-point surface covariances for GICP (plane-to-plane) registration.

PCL's GICP estimates a covariance from each point's k nearest neighbors and
regularizes its eigenvalues to ``(1, 1, ε)`` — treating every local surface
patch as a disk (GICP, Segal et al.). The TPU formulation computes all
covariances at once: blocked k-NN (MXU matmuls) → neighbor gather →
closed-form symmetric-3×3 eigen-solve → eigenvalue replacement.

Covariances are returned **components-first**: a ``(6, N)`` array packed as
``[xx, xy, xz, yy, yz, zz]`` (see ``ops.linalg3.mat_to_sym6``). The batch
axis rides the 128-wide TPU lanes, so the whole pipeline — estimation here,
fusion/inversion inside ``ops.icp`` — runs on full VPU tiles with no
``(N, 3, 3)`` tile-padding traffic. Convert with ``linalg3.sym6_to_mat``
when a dense matrix view is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icpslam_tpu.cloud.pointcloud import PointCloud
from icpslam_tpu.ops import nn as nn_ops
from icpslam_tpu.ops.linalg3 import (
    smallest_eigenvector_sym3_comps,
    sym3_comps,
)

# packed identity covariance [xx, xy, xz, yy, yz, zz]
EYE6 = (1.0, 0.0, 0.0, 1.0, 0.0, 1.0)


def _regularize_comps(comps, good, epsilon: float, dtype) -> jnp.ndarray:
    """GICP disk regularization ``I − (1−ε)·n nᵀ`` from the patch normal.

    ``comps``: six (N,) covariance components; ``good``: (N,) bool — points
    with a usable neighborhood (identity covariance otherwise). Returns the
    packed (6, N) regularized covariances.
    """
    nx, ny, nz = smallest_eigenvector_sym3_comps(*comps)
    s = jnp.asarray(1.0 - epsilon, dtype)
    reg = (
        1.0 - s * nx * nx,
        -s * nx * ny,
        -s * nx * nz,
        1.0 - s * ny * ny,
        -s * ny * nz,
        1.0 - s * nz * nz,
    )
    eye = jnp.asarray(EYE6, dtype)
    return jnp.stack(
        [jnp.where(good, r, e) for r, e in zip(reg, eye)]
    )


def gicp_covariances(
    cloud: PointCloud,
    k: int = 10,
    epsilon: float = 1e-3,
    block: int = 512,
    approx: bool = True,
) -> jnp.ndarray:
    """GICP-regularized covariances, packed (6, N), for every cloud point.

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
    dtype = pts.dtype
    # statistics tolerate approximate neighbors: HIGH (3-pass bf16)
    # distances + 0.9 recall cut the stage 1.38->0.84 ms/scan on v5e
    # with normals matching exact selection (median |n.n'| = 1.0,
    # 5th percentile 0.998 at bench sizes)
    idx, d2 = nn_ops.knn(
        pts, pts, cloud.mask, k=k, block=block, approx=approx,
        recall_target=0.9 if approx else 0.95,
        precision=jax.lax.Precision.HIGH,
    )

    # Gather neighbors as (N, k, 3) rows — XLA lowers row gathers well —
    # then transpose to the (k, N) lane layout for the moment reductions
    # (N on the 128-wide lane axis; scalar-indexed gathers like
    # ``px[idx.T]`` measured 8x slower, (N, k, 3) einsum moments 2.5x).
    neigh = pts[idx]  # (N, k, 3)
    w = jnp.isfinite(d2).T.astype(dtype)  # (k, N); False when < k neighbors
    nxk = neigh[..., 0].T  # (k, N)
    nyk = neigh[..., 1].T
    nzk = neigh[..., 2].T

    count = jnp.maximum(jnp.sum(w, axis=0), 1.0)  # (N,)
    mx = jnp.sum(w * nxk, axis=0) / count
    my = jnp.sum(w * nyk, axis=0) / count
    mz = jnp.sum(w * nzk, axis=0) / count
    cx, cy, cz = nxk - mx, nyk - my, nzk - mz
    comps = (
        jnp.sum(w * cx * cx, axis=0) / count,
        jnp.sum(w * cx * cy, axis=0) / count,
        jnp.sum(w * cx * cz, axis=0) / count,
        jnp.sum(w * cy * cy, axis=0) / count,
        jnp.sum(w * cy * cz, axis=0) / count,
        jnp.sum(w * cz * cz, axis=0) / count,
    )
    # Degenerate points (too few neighbors) → identity covariance.
    good = (jnp.sum(w, axis=0) >= 3) & cloud.mask
    return _regularize_comps(comps, good, epsilon, dtype)


def gicp_covariances_radius(
    cloud: PointCloud,
    radius: float,
    epsilon: float = 1e-3,
    sigma: float = 0.0,
) -> jnp.ndarray:
    """GICP covariances, packed (6, N), from *fixed-radius* neighborhoods.

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

    # need ≥3 neighbors (the point itself is always in-radius; with a
    # Gaussian taper `count` is the effective weight sum Σw, so the
    # equivalent threshold is lower — the self-weight alone is 1)
    good = (count >= (2.0 if sigma > 0 else 3.0)) & cloud.mask
    return _regularize_comps(sym3_comps(cov), good, epsilon, pts.dtype)
