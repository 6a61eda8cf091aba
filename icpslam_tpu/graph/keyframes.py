"""Fixed-capacity keyframe store.

Replaces the reference's ``Keyframe<PointType>`` records + std::vector
(``/root/reference/include/icpslam/keyframe.h:17-38``,
``src/icpslam/icpslam.cpp:88``) with a struct-of-arrays pytree: poses in
odom frame at creation, current graph estimates, timestamps, and the
keyframe point clouds (retained like the reference does, and additionally
*used* here for loop-closure verification and map re-rendering —
SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from icpslam_tpu.cloud import pointcloud as pc
from icpslam_tpu.geometry import se3
from icpslam_tpu.geometry.se3 import Pose


class KeyframeStore(NamedTuple):
    pose_odom: Pose        # (K,) pose in odom frame at creation
    pose_graph: Pose       # (K,) current graph (map-frame) estimate
    stamp: jnp.ndarray     # (K,) float32 seconds
    points: jnp.ndarray    # (K, N, 3) keyframe clouds (downsampled)
    point_mask: jnp.ndarray  # (K, N) bool
    cov: jnp.ndarray       # (K, 6, 6) measurement covariance of the
    #                        registration that created each keyframe —
    #                        the Pose6DOF covariance the reference carries
    #                        (pose6DOF.h:15-126) and publishes with
    #                        odometry (messaging_utils.cpp:26-49)
    count: jnp.ndarray     # int32 number of live keyframes
    evictions: jnp.ndarray  # int32 keyframes marginalized out at capacity
    #                         (graph/marginalize.py) — counted, never silent

    @property
    def capacity(self) -> int:
        return self.stamp.shape[0]

    def valid_mask(self) -> jnp.ndarray:
        return (
            jnp.arange(self.capacity, dtype=jnp.int32) < self.count
        )


def empty(capacity: int, cloud_capacity: int, dtype=jnp.float32) -> KeyframeStore:
    return KeyframeStore(
        pose_odom=se3.identity((capacity,), dtype),
        pose_graph=se3.identity((capacity,), dtype),
        stamp=jnp.zeros((capacity,), dtype),
        points=jnp.zeros((capacity, cloud_capacity, 3), dtype),
        point_mask=jnp.zeros((capacity, cloud_capacity), bool),
        cov=jnp.zeros((capacity, 6, 6), dtype),
        count=jnp.asarray(0, jnp.int32),
        evictions=jnp.asarray(0, jnp.int32),
    )


def add(
    store: KeyframeStore,
    pose_odom: Pose,
    pose_graph: Pose,
    cloud: pc.PointCloud,
    stamp: jnp.ndarray,
    cov: jnp.ndarray | None = None,
) -> Tuple[KeyframeStore, jnp.ndarray]:
    """Append a keyframe; returns (store, new_keyframe_index).

    At capacity the write is dropped (index clamps to capacity-1 but count
    stops growing) — callers can detect overflow via count == capacity.
    ``cov``: optional (6, 6) measurement covariance (zeros = unknown).
    """
    idx = jnp.minimum(store.count, store.capacity - 1)
    full = store.count >= store.capacity
    if cov is None:
        cov = jnp.zeros((6, 6), store.cov.dtype)

    def upd(arr, val):
        return jnp.where(full, arr, arr.at[idx].set(val))

    new = KeyframeStore(
        pose_odom=Pose(t=upd(store.pose_odom.t, pose_odom.t), q=upd(store.pose_odom.q, pose_odom.q)),
        pose_graph=Pose(t=upd(store.pose_graph.t, pose_graph.t), q=upd(store.pose_graph.q, pose_graph.q)),
        stamp=upd(store.stamp, stamp),
        points=upd(store.points, cloud.points),
        point_mask=upd(store.point_mask, cloud.mask),
        cov=upd(store.cov, cov),
        count=jnp.where(full, store.count, store.count + 1),
        evictions=store.evictions,
    )
    return new, idx


def latest(store: KeyframeStore) -> Pose:
    """Graph pose of the most recent keyframe (identity when empty)."""
    idx = jnp.maximum(store.count - 1, 0)
    return Pose(t=store.pose_graph.t[idx], q=store.pose_graph.q[idx])


def latest_odom(store: KeyframeStore) -> Pose:
    idx = jnp.maximum(store.count - 1, 0)
    return Pose(t=store.pose_odom.t[idx], q=store.pose_odom.q[idx])


def set_graph_poses(store: KeyframeStore, poses: Pose) -> KeyframeStore:
    """Write back optimized poses (only live entries change)."""
    m = store.valid_mask()
    return store._replace(
        pose_graph=Pose(
            t=jnp.where(m[:, None], poses.t, store.pose_graph.t),
            q=jnp.where(m[:, None], poses.q, store.pose_graph.q),
        )
    )
