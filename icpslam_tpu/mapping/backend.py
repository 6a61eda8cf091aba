"""Map-backend dispatch: 'point' (append-only + exact NN, TPU-fast) or
'voxel' (sorted voxel hash with spatial lookups, reference-style).

The choice is static (``config.map_backend``), so the SLAM state pytree
simply contains whichever map type the config selects — no runtime
branching, no shape unions.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp

from icpslam_tpu.cloud.pointcloud import PointCloud
from icpslam_tpu.config import SlamConfig
from icpslam_tpu.mapping import point_map as pm
from icpslam_tpu.mapping import voxel_map as vm

MapState = Union[pm.PointMap, vm.VoxelMap]


def empty(config: SlamConfig) -> MapState:
    if config.map_backend == "point":
        return pm.empty_map(config.max_map_points)
    return vm.empty_map(config.max_map_points)


def reset(map_: MapState) -> MapState:
    if isinstance(map_, pm.PointMap):
        return pm.reset(map_)
    return vm.reset(map_)


def insert(
    map_: MapState,
    cloud: PointCloud,
    resolution: float,
    covs: jnp.ndarray | None = None,
) -> MapState:
    """``covs``: optional packed (6, N) map-frame surface covariances
    (``linalg3.mat_to_sym6`` layout) stored with the points (point backend
    only; the voxel backend ignores them — its plane-mode queries
    recompute covariances from the NN cloud)."""
    if isinstance(map_, pm.PointMap):
        return pm.insert(map_, cloud, resolution, covs=covs)
    return vm.insert(map_, cloud, resolution)


def insert_reusing_nn(
    map_: MapState,
    cloud: PointCloud,
    resolution: float,
    nn_dist2: jnp.ndarray,
    covs: jnp.ndarray | None = None,
) -> MapState:
    """Insert with a precomputed per-point NN distance to the map.

    Point backend: skips the dedup NN sweep (``point_map.insert_with_nn``).
    Voxel backend: the sorted index must be rebuilt anyway, so this is the
    plain insert.
    """
    if isinstance(map_, pm.PointMap):
        return pm.insert_with_nn(map_, cloud, resolution, nn_dist2, covs=covs)
    return vm.insert(map_, cloud, resolution)


def query_nn(
    map_: MapState,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    config: SlamConfig,
) -> vm.MapNNResult:
    if isinstance(map_, pm.PointMap):
        return pm.exact_nn(map_, points, mask)
    return vm.approx_nn(
        map_, points, mask, config.map_resolution, radius=config.map_nn_radius
    )


def query_nn_with_covs(
    map_: MapState,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    config: SlamConfig,
    prune_beyond: float | None = None,
):
    """NN query returning stored covariances when the backend carries them.

    Returns ``(MapNNResult, covs_or_None)`` — ``covs`` is packed (6, Q) in
    the *map* frame for the point backend, ``None`` for the voxel backend
    (whose callers recompute from the NN cloud). ``prune_beyond`` is the
    point backend's static don't-care radius license (see
    ``point_map.exact_nn_with_covs``).
    """
    if isinstance(map_, pm.PointMap):
        return pm.exact_nn_with_covs(map_, points, mask, prune_beyond=prune_beyond)
    return (
        vm.approx_nn(
            map_, points, mask, config.map_resolution, radius=config.map_nn_radius
        ),
        None,
    )
