"""External (wheel / filtered) odometry ingestion.

Functional equivalent of the reference's ``RobotOdometer``
(``/root/reference/src/icpslam/robot_odometer.cpp``): consume an external
odometry pose stream, remove the initial offset, and keep a pose history
gated by a minimum displacement.

Contract preserved:
- offset removal against the first pose (``robot_odometer.cpp:76``)
- 0.1 m displacement gate (``POSE_DIST_THRESH``, ``robot_odometer.h:40``,
  promoted to ``config.wheel_odom_pose_gate``)
- covariance carried alongside the pose (``:72-73``) for use as graph-edge
  information when wheel-odometry fusion is enabled — the feature the
  reference comments out (``icpslam.cpp:156-167``) and we implement
  (SURVEY.md §7.4)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from icpslam_tpu.config import SlamConfig
from icpslam_tpu.geometry import se3
from icpslam_tpu.geometry.se3 import Pose


class RobotOdometryState(NamedTuple):
    initialized: jnp.ndarray   # bool
    first_pose: Pose           # raw first pose (offset reference)
    pose: Pose                 # latest offset-removed pose
    last_gated_pose: Pose      # last pose that passed the displacement gate
    covariance: jnp.ndarray    # (6, 6) latest covariance
    num_poses: jnp.ndarray     # int32 gated poses kept
    num_received: jnp.ndarray  # int32 raw messages seen


class RobotOdometryOutput(NamedTuple):
    pose: Pose                 # offset-removed pose
    gated: jnp.ndarray         # bool: displacement gate passed (pose recorded)
    is_first: jnp.ndarray      # bool


def init_state(dtype=jnp.float32) -> RobotOdometryState:
    ident = se3.identity(dtype=dtype)
    return RobotOdometryState(
        initialized=jnp.asarray(False),
        first_pose=ident,
        pose=ident,
        last_gated_pose=ident,
        covariance=jnp.eye(6, dtype=dtype),
        num_poses=jnp.asarray(0, jnp.int32),
        num_received=jnp.asarray(0, jnp.int32),
    )


def robot_odometry_step(
    state: RobotOdometryState,
    raw_pose: Pose,
    config: SlamConfig,
    covariance: jnp.ndarray | None = None,
) -> Tuple[RobotOdometryState, RobotOdometryOutput]:
    """Ingest one external odometry pose (jit-compatible)."""
    if covariance is None:
        covariance = state.covariance

    is_first = ~state.initialized
    first = Pose(
        t=jnp.where(is_first, raw_pose.t, state.first_pose.t),
        q=jnp.where(is_first, raw_pose.q, state.first_pose.q),
    )
    # offset removal: pose relative to the first raw pose (``:76``)
    pose = se3.normalize(se3.relative(first, raw_pose))

    moved = se3.distance_translation(pose, state.last_gated_pose)
    gated = is_first | (moved >= config.wheel_odom_pose_gate)

    new_state = RobotOdometryState(
        initialized=jnp.asarray(True),
        first_pose=first,
        pose=pose,
        last_gated_pose=Pose(
            t=jnp.where(gated, pose.t, state.last_gated_pose.t),
            q=jnp.where(gated, pose.q, state.last_gated_pose.q),
        ),
        covariance=covariance,
        num_poses=state.num_poses + gated.astype(jnp.int32),
        num_received=state.num_received + 1,
    )
    return new_state, RobotOdometryOutput(pose=pose, gated=gated, is_first=is_first)
