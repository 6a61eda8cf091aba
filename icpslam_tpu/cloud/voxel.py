"""Voxel-grid operations on padded clouds.

``voxel_downsample`` replaces PCL's ``VoxelGrid`` filter
(``/root/reference/src/icpslam/icp_odometer.cpp:96-101``): one centroid per
occupied voxel. The TPU formulation is sort-based — compute integer voxel
coordinates, lexicographically sort, mark segment starts, and scatter-add
points into per-voxel accumulators — all static shapes, no host round-trip.

The voxel-coordinate helpers here are shared with the mapping layer
(occupancy dedup and approximate NN in ``mapping/voxel_map.py``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from icpslam_tpu.cloud.pointcloud import PointCloud

# Sentinel voxel coordinate for invalid (padding) points: sorts after any
# real voxel. Real coords are bounded by |x| / resolution; 2**24 leaves a
# huge margin for e.g. ±800 km extent at 0.05 m resolution.
SENTINEL: int = 2**24


def voxel_coords(points: jnp.ndarray, resolution: float, mask=None) -> jnp.ndarray:
    """Integer voxel coordinates (..., 3) int32; invalid points → SENTINEL."""
    coords = jnp.floor(points / resolution).astype(jnp.int32)
    if mask is not None:
        coords = jnp.where(mask[..., None], coords, SENTINEL)
    return coords


def lexsort_order(coords: jnp.ndarray) -> jnp.ndarray:
    """Sort order over rows of (N, 3) int32 coords (x primary, then y, z)."""
    return jnp.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))


def segment_starts(sorted_coords: jnp.ndarray, sorted_valid: jnp.ndarray) -> jnp.ndarray:
    """Boolean (N,) marking the first row of each run of equal coords.

    Only valid rows can start a segment; invalid rows (all-SENTINEL) are
    excluded via ``sorted_valid``.
    """
    prev = jnp.roll(sorted_coords, 1, axis=0)
    differs = jnp.any(sorted_coords != prev, axis=-1)
    differs = differs.at[0].set(True)
    return differs & sorted_valid


# Packed-key sort: a single scan has bounded extent, so voxel coordinates
# relative to the scan's min corner fit in 11+11+10 bits (2048×2048×1024
# cells — e.g. 409×409×204 m at 0.2 m leaves). One 32-bit sort replaces
# the 3-pass lexsort. Out-of-range cells (gigantic scans / tiny leaves)
# clamp into the boundary cell; that merges only the pathological fringe.
_PACK_BITS = (11, 11, 10)


def _packed_keys(coords: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """(N,) int32 sort keys from relative voxel coords; invalid → max key."""
    bx, by, bz = _PACK_BITS
    base = jnp.min(jnp.where(valid[:, None], coords, 2**22), axis=0)
    rel = coords - base
    rx = jnp.clip(rel[:, 0], 0, (1 << bx) - 1)
    ry = jnp.clip(rel[:, 1], 0, (1 << by) - 1)
    rz = jnp.clip(rel[:, 2], 0, (1 << bz) - 1)
    key = (rx << (by + bz)) | (ry << bz) | rz
    return jnp.where(valid, key, jnp.int32(2**31 - 1))


def voxel_downsample(
    cloud: PointCloud, resolution: float, capacity: int
) -> Tuple[PointCloud, jnp.ndarray]:
    """Downsample to one centroid per occupied voxel.

    Returns ``(filtered_cloud, num_voxels)`` where ``filtered_cloud`` has the
    given static ``capacity`` and ``num_voxels`` is the true number of
    occupied voxels — callers can detect overflow via
    ``num_voxels > capacity`` (voxels beyond capacity are dropped in sorted
    coordinate order; SURVEY.md "no silent caps").
    """
    coords = voxel_coords(cloud.points, resolution, cloud.mask)
    keys = _packed_keys(coords, cloud.mask)
    order = jnp.argsort(keys)
    sc = coords[order]
    sp = cloud.points[order]
    sv = cloud.mask[order]

    starts = segment_starts(sc, sv)
    # slot id per sorted row: index of its voxel among unique voxels
    slot = jnp.cumsum(starts.astype(jnp.int32)) - 1
    num_voxels = slot[-1] + 1  # == number of unique valid voxels (0 if none)
    num_voxels = jnp.where(jnp.any(sv), num_voxels, 0)
    # route invalid rows (and overflow slots) out of range → dropped
    slot = jnp.where(sv, slot, capacity)

    w = sv.astype(sp.dtype)
    sums = jnp.zeros((capacity, 3), dtype=sp.dtype).at[slot].add(
        sp * w[:, None], mode="drop"
    )
    counts = jnp.zeros((capacity,), dtype=sp.dtype).at[slot].add(w, mode="drop")
    occupied = counts > 0
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    centroids = jnp.where(occupied[:, None], centroids, 0.0)
    return PointCloud(points=centroids, mask=occupied), num_voxels
