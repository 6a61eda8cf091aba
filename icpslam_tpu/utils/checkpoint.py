"""Checkpoint / resume.

The reference has none (SURVEY.md §5.4): all state dies with the process,
and the map is even discarded at every optimization. Here the durable
record is exactly what the reference already keeps in memory — keyframes
(pose + cloud) and the graph — so a checkpoint is the full ``SlamState``
pytree serialized to a compressed numpy archive, and the map is
*derivable*: ``rerender_map`` rebuilds it from keyframe clouds at their
graph poses (fixing the reference's map-goes-blank-after-optimize behavior
without changing its reset-then-regrow contract).

Works for any pytree of arrays (states, keyframe stores, edge sets);
leaves are addressed by their tree path, so loading validates structure
against a template built from the same config.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from icpslam_tpu.cloud.pointcloud import PointCloud
from icpslam_tpu.config import SlamConfig
from icpslam_tpu.geometry import se3


def _leaf_dict(tree: Any) -> dict:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def save(path: str, tree: Any) -> None:
    """Serialize a pytree of arrays to ``path`` (.npz)."""
    np.savez_compressed(path, **_leaf_dict(tree))


def load(path: str, template: Any) -> Any:
    """Load a pytree saved with ``save``; ``template`` (e.g.
    ``slam.init_state(config)``) provides the structure and dtypes.

    Forward compatibility: a leaf present in the template but absent from
    the checkpoint (a state field added after the checkpoint was written,
    e.g. ``KeyframeStore.evictions`` in r5 or ``cov`` in r4) is defaulted
    from the template with a warning instead of failing — old endurance /
    resume artifacts stay loadable across format growth (ADVICE r4).
    """
    import warnings

    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for keypath, tleaf in flat:
        key = jax.tree_util.keystr(keypath)
        if key not in data:
            warnings.warn(
                f"checkpoint {path} predates state leaf {key}; "
                "defaulting it from the template"
            )
            leaves.append(jnp.asarray(tleaf))
            continue
        arr = data[key]
        texp = np.asarray(tleaf)
        if arr.shape != texp.shape:
            raise ValueError(
                f"checkpoint leaf {key} has shape {arr.shape}, "
                f"config expects {texp.shape}"
            )
        leaves.append(jnp.asarray(arr, dtype=texp.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def rerender_map(state, config: SlamConfig, mesh=None):
    """Rebuild the voxel map from keyframe clouds at their graph poses.

    Returns a new ``SlamState`` with the regenerated map (used on resume
    and whenever a full map product is wanted after an optimize-reset).
    ``mesh`` is required for ``config.map_backend == 'sharded'`` — the
    rebuilt map is re-sharded by the same spatial hash.
    """
    from icpslam_tpu.geometry import quaternion as quat
    from icpslam_tpu.mapping import backend as map_backend
    from icpslam_tpu.mapping import point_map as pm

    store = state.keyframes
    n = int(state.keyframes.count)
    m = map_backend.empty(config)
    # plane-mode point maps carry per-point covariances — restore them so
    # resumed scan-to-map registration keeps its gathered target planes
    with_covs = (
        isinstance(m, pm.PointMap)
        and config.icp_mapping.mode == "plane"
        and config.voxel_leaf_size >= config.map_resolution
    )
    if with_covs:
        import jax

        from icpslam_tpu.pipeline.odometry import compute_covariances

        cov_fn = jax.jit(
            lambda c: compute_covariances(c, config.icp_mapping)
        )
    for k in range(n):
        cloud = PointCloud(points=store.points[k], mask=store.point_mask[k])
        pose = se3.index(store.pose_graph, k)
        world = PointCloud(
            points=se3.transform_points(pose, cloud.points) * cloud.mask[:, None],
            mask=cloud.mask,
        )
        if with_covs:
            from icpslam_tpu.ops.linalg3 import rotate_sym3_comps

            R = quat.to_matrix(pose.q)
            c6 = cov_fn(cloud)
            covs_w = jnp.stack(
                rotate_sym3_comps(R, tuple(c6[i] for i in range(6)))
            )
            nn = pm.exact_nn(m, world.points, world.mask)
            m = pm.insert_with_nn(
                m, world, config.map_resolution, nn.dist2, covs=covs_w,
                eviction=config.map_eviction,
            )
        else:
            m = map_backend.insert(
                m, world, config.map_resolution, mesh=mesh,
                eviction=config.map_eviction,
            )
    return state._replace(map=m)
