"""Multi-device batched SLAM step: DP registration + distributed graph solve.

This is the framework's "full training step" analog for a device mesh —
the offline/batch counterpart to the streaming ``pipeline.slam`` loop (a
pattern the reference cannot express at all; SURVEY.md §2.3):

1. a batch of consecutive scan *pairs* is sharded across the ``dp`` axis;
   every device registers its pairs with vmapped ICP (embarrassingly
   parallel — XLA partitions the vmap over the sharded batch axis)
2. the per-pair relative poses are chained into a trajectory with an
   associative scan (parallel prefix over SE(3) composition)
3. sequential graph edges are built from the relative poses, and the pose
   graph is optimized with the *edge-sharded* distributed Gauss-Newton
   (``parallel/dist_graph``): per-device Jacobian/assembly + ``psum`` over
   ICI, replicated solve

Used by ``__graft_entry__.dryrun_multichip`` to validate the multi-chip
sharding compiles and runs (8 virtual CPU devices in CI, real slices in
production).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from icpslam_tpu.cloud.pointcloud import PointCloud
from icpslam_tpu.config import IcpConfig
from icpslam_tpu.geometry import se3
from icpslam_tpu.geometry.se3 import Pose
from icpslam_tpu.graph import pose_graph as pg
from icpslam_tpu.ops import icp as icp_ops
from icpslam_tpu.parallel import dist_graph


class BatchSlamResult(NamedTuple):
    nodes: Pose            # (B+1,) optimized trajectory
    rel_poses: Pose        # (B,) pairwise registrations
    fitness: jnp.ndarray   # (B,)
    final_cost: jnp.ndarray


def chain_poses(rel: Pose, base: Pose) -> Pose:
    """Integrate relative poses into absolute ones with a parallel prefix:
    nodes[k] = base ∘ rel[0] ∘ … ∘ rel[k-1]. Returns (B+1,) poses."""
    scanned = jax.lax.associative_scan(se3.compose, rel)
    first = Pose(t=base.t[None], q=base.q[None])
    rest = se3.compose(base, scanned)
    return Pose(
        t=jnp.concatenate([first.t, rest.t], axis=0),
        q=jnp.concatenate([first.q, rest.q], axis=0),
    )


def batched_slam_step(
    src: PointCloud,        # (B, N, 3)/(B, N) batched source scans
    tgt: PointCloud,        # (B, N, 3)/(B, N) batched target scans
    icp_config: IcpConfig,
    mesh: Mesh,
    info_diag: float = 100.0,
    solver_iterations: int = 5,
    axis: str = "dp",
) -> BatchSlamResult:
    """One sharded batch step. Call under jit with ``src``/``tgt`` leaves
    placed with a ``P(axis)`` leading-dimension sharding."""

    def register(sp, sm, tp, tm):
        src_c, tgt_c = PointCloud(sp, sm), PointCloud(tp, tm)
        kwargs = {}
        if icp_config.mode == "plane":
            # GICP covariances per cloud (vmap-compatible knn statistics)
            from icpslam_tpu.pipeline.odometry import compute_covariances

            kwargs = dict(
                source_covs=compute_covariances(src_c, icp_config),
                target_covs=compute_covariances(tgt_c, icp_config),
            )
        res = icp_ops.icp(src_c, tgt_c, icp_config, **kwargs)
        return res.pose.t, res.pose.q, res.fitness

    # XLA SPMD partitions the vmap over the sharded batch axis.
    rel_t, rel_q, fitness = jax.vmap(register)(
        src.points, src.mask, tgt.points, tgt.mask
    )
    rel = Pose(t=rel_t, q=rel_q)

    nodes0 = chain_poses(rel, se3.identity())
    B = rel_t.shape[0]
    K = B + 1

    edges = pg.EdgeSet(
        i=jnp.arange(B, dtype=jnp.int32),
        j=jnp.arange(1, B + 1, dtype=jnp.int32),
        rel_t=rel.t,
        rel_q=rel.q,
        info=jnp.broadcast_to(info_diag * jnp.eye(6, dtype=rel_t.dtype), (B, 6, 6)),
        valid=jnp.ones((B,), bool),
        count=jnp.asarray(B, jnp.int32),
        overflow=jnp.asarray(0, jnp.int32),
    )
    node_mask = jnp.ones((K,), bool)
    opt, stats = dist_graph.optimize(
        nodes0, edges, node_mask, mesh,
        iterations=solver_iterations, mode="gn", axis=axis,
    )
    return BatchSlamResult(
        nodes=opt, rel_poses=rel, fitness=fitness, final_cost=stats.final_cost
    )


def batched_slam_step_with_map(
    src: PointCloud,
    tgt: PointCloud,
    icp_config: IcpConfig,
    mesh: Mesh,
    map_resolution: float = 0.3,
    map_capacity_per_shard: int = 1024,
    axis: str = "dp",
):
    """Batch step + spatially-sharded map build and query.

    Extends ``batched_slam_step`` with the remaining multi-device
    subsystem: every registered scan is inserted into the spatially-
    sharded voxel map at its optimized pose (communication-free insert)
    and the first scan is queried back (pmin/psum NN reduce). Exercises
    every collective family the framework uses — the shape validated by
    ``dryrun_multichip``.
    """
    from icpslam_tpu.geometry.se3 import Pose as _Pose
    from icpslam_tpu.parallel import sharded_map as sm

    result = batched_slam_step(src, tgt, icp_config, mesh, axis=axis)
    n_dev = mesh.shape[axis]
    smap = sm.empty_sharded_map(map_capacity_per_shard, n_dev)
    B, N = src.points.shape[:2]
    # all scans → world frame in one vmapped transform, then ONE flattened
    # sharded insert (no Python per-scan loop — it unrolled at batch scale,
    # VERDICT r1 item 7; the spatial hash routes every point regardless of
    # which scan it came from)
    poses_b = _Pose(t=result.nodes.t[1:], q=result.nodes.q[1:])
    world_pts = jax.vmap(se3.transform_points)(poses_b, src.points)  # (B, N, 3)
    all_cloud = PointCloud(
        points=world_pts.reshape(B * N, 3), mask=src.mask.reshape(B * N)
    )
    smap = sm.insert(smap, all_cloud, map_resolution, mesh, axis=axis)
    first = se3.transform_points(
        _Pose(t=result.nodes.t[1], q=result.nodes.q[1]), src.points[0]
    )
    nn = sm.approx_nn(smap, first, src.mask[0], map_resolution, mesh, axis=axis)
    return result, smap, nn


def make_batched_step(icp_config: IcpConfig, mesh: Mesh, axis: str = "dp"):
    """Jitted batched step with input shardings pinned to the mesh."""
    shard = NamedSharding(mesh, P(axis))

    @partial(jax.jit, static_argnums=())
    def step(src_pts, src_mask, tgt_pts, tgt_mask):
        src = PointCloud(
            jax.lax.with_sharding_constraint(src_pts, shard),
            jax.lax.with_sharding_constraint(src_mask, shard),
        )
        tgt = PointCloud(
            jax.lax.with_sharding_constraint(tgt_pts, shard),
            jax.lax.with_sharding_constraint(tgt_mask, shard),
        )
        return batched_slam_step(src, tgt, icp_config, mesh, axis=axis)

    return step
