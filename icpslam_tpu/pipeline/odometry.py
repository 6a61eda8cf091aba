"""ICP scan-to-scan odometry front-end.

Functional equivalent of the reference's ``IcpOdometer``
(``/root/reference/src/icpslam/icp_odometer.cpp``): voxel-filter the
incoming cloud, register it against the previous cloud, and accumulate the
relative transform into an odometry pose — but as a pure
``state' , out = odometry_step(state, scan)`` function under ``jit``
instead of a racy ROS callback (SURVEY.md §5.2: single-owner functional
state replaces the reference's unlocked shared mutables).

Behavioral contract preserved:
- cloud skipping for high-rate sensors (``icp_odometer.cpp:154-159``)
- first-cloud bootstrap stash (``:179-182``)
- accept gate ``converged && fitness < threshold`` (``:201``); a rejected
  scan does not advance the pose (graceful degradation, SURVEY §5.3)
- a drainable relative-transform accumulator mirroring
  ``icp_latest_transform_`` handed out by ``getEstimates`` (``:82-94``)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from icpslam_tpu.cloud import pointcloud as pc
from icpslam_tpu.cloud.voxel import voxel_downsample
from icpslam_tpu.config import SlamConfig
from icpslam_tpu.geometry import se3
from icpslam_tpu.geometry.se3 import Pose
from icpslam_tpu.ops import covariance as cov_ops
from icpslam_tpu.ops import icp as icp_ops

def compute_covariances(cloud, icfg):
    """Covariances for a cloud per the ICP config (radius or knn mode)."""
    if icfg.covariance_mode == "radius":
        return cov_ops.gicp_covariances_radius(
            cloud,
            radius=icfg.covariance_radius,
            epsilon=icfg.covariance_epsilon,
            sigma=icfg.covariance_sigma,
        )
    return cov_ops.gicp_covariances(
        cloud, k=icfg.covariance_knn, epsilon=icfg.covariance_epsilon
    )



class OdometryState(NamedTuple):
    initialized: jnp.ndarray   # bool: first cloud stashed
    pose: Pose                 # accumulated odometry pose (odom frame)
    accum: Pose                # relative-transform accumulator (drained by back-end)
    prev_cloud: pc.PointCloud  # last processed (filtered) cloud
    prev_covs: jnp.ndarray     # (6, N) packed GICP covariances of prev_cloud
    last_transform: Pose       # last accepted relative motion (constant-velocity prior)
    skip_count: jnp.ndarray    # int32 remaining clouds to skip
    scan_count: jnp.ndarray    # int32 total scans seen


class OdometryOutput(NamedTuple):
    pose: Pose                 # odometry pose after this scan
    transform: Pose            # accepted relative transform (identity if rejected)
    processed: jnp.ndarray     # bool: scan was registered (not skipped/bootstrap)
    accepted: jnp.ndarray      # bool: passed the convergence+fitness gate
    fitness: jnp.ndarray
    num_correspondences: jnp.ndarray
    iterations: jnp.ndarray
    num_voxels: jnp.ndarray    # occupied voxels before capacity clipping
    filtered: pc.PointCloud    # the downsampled scan (consumed by mapping)
    filtered_covs: jnp.ndarray  # (6, N) packed GICP covariances of
                               # `filtered` (linalg3.mat_to_sym6 layout;
                               # meaningful only in plane mode — identity
                               # placeholders otherwise)
    hessian: jnp.ndarray       # (6, 6) final GN Hessian of the accepted
                               # registration (zeros unless
                               # config.adaptive_information and accepted)


def init_state(config: SlamConfig, initial_pose: Pose | None = None) -> OdometryState:
    if initial_pose is None:
        initial_pose = se3.identity()
    n = config.max_points
    return OdometryState(
        initialized=jnp.asarray(False),
        pose=initial_pose,
        accum=se3.identity(),
        prev_cloud=pc.empty(n),
        prev_covs=jnp.broadcast_to(
            jnp.asarray(cov_ops.EYE6, jnp.float32)[:, None], (6, n)
        ),
        last_transform=se3.identity(),
        skip_count=jnp.asarray(0, jnp.int32),
        scan_count=jnp.asarray(0, jnp.int32),
    )


def set_initial_pose(state: OdometryState, pose: Pose) -> OdometryState:
    """Bootstrap from external (wheel) odometry — ``setInitialPose``
    (``icp_odometer.cpp:69-72``)."""
    return state._replace(pose=pose)


def drain_accumulator(state: OdometryState) -> Tuple[Pose, OdometryState]:
    """Hand out the accumulated relative transform since the last drain and
    reset it to identity — ``getEstimates`` semantics (``:82-94``)."""
    return state.accum, state._replace(accum=se3.identity())


def run_scans(
    state: OdometryState, scans: pc.PointCloud, config: SlamConfig
) -> Tuple[OdometryState, OdometryOutput]:
    """Process a chunk of scans in one device program (``lax.scan``).

    ``scans`` is a batched PointCloud (leading time axis, e.g. stacked with
    ``jax.tree_util.tree_map(lambda *x: jnp.stack(x), *clouds)``); outputs
    gain the same leading axis. Chunked driving amortizes the per-call
    host dispatch — on the tunneled v5e it is worth ~1.4 ms/scan (~+28%
    throughput) over step-by-step calls. Jit with ``static_argnums=(2,)``.
    """

    def f(st, scan):
        return odometry_step(st, scan, config)

    return jax.lax.scan(f, state, scans)


def odometry_step(
    state: OdometryState, raw_scan: pc.PointCloud, config: SlamConfig
) -> Tuple[OdometryState, OdometryOutput]:
    """Process one raw sensor-frame scan. Jit with ``static_argnums=(2,)``."""
    icfg = config.icp_odometry
    plane = icfg.mode == "plane"

    # sensor extrinsic: express the laser-frame scan in the robot frame
    # before filtering — the reference's per-cloud tf2 transform
    # (``icp_odometer.cpp:162-174``). Static identity check: the common
    # identity-extrinsic case adds no ops to the compiled step.
    if config.has_laser_extrinsic:
        ext = Pose(
            t=jnp.asarray(config.laser_extrinsic_t, raw_scan.points.dtype),
            q=jnp.asarray(config.laser_extrinsic_q, raw_scan.points.dtype),
        )
        raw_scan = pc.transform(ext, raw_scan)

    filtered, num_voxels = voxel_downsample(
        raw_scan, config.voxel_leaf_size, config.max_points
    )
    covs = (
        compute_covariances(filtered, icfg)
        if plane
        else state.prev_covs  # unused placeholder keeps pytree shape static
    )

    skip = state.initialized & (state.skip_count > 0)
    do_register = state.initialized & ~skip

    def register(_):
        # constant-velocity prior: seed ICP with the last accepted motion.
        # (Improvement over the reference's identity init — lets the gate
        # hold at larger inter-scan motion; falls back gracefully since a
        # bad prior just costs iterations.)
        res = icp_ops.icp(
            filtered,
            state.prev_cloud,
            icfg,
            init=state.last_transform,
            source_covs=covs if plane else None,
            target_covs=state.prev_covs if plane else None,
            # voxel_downsample outputs are prefix-packed -> the NN kernel
            # can skip dead-capacity tiles (cost scales with fill)
            target_valid_len=jnp.sum(state.prev_cloud.mask.astype(jnp.int32)),
            want_hessian=config.adaptive_information,
        )
        accepted = res.converged & (res.fitness < icfg.fitness_threshold)
        # icp maps current scan into the previous frame → relative motion
        transform = Pose(
            t=jnp.where(accepted, res.pose.t, 0.0),
            q=jnp.where(accepted, res.pose.q, se3.identity().q),
        )
        hess = (
            res.hessian * accepted.astype(jnp.float32)
            if config.adaptive_information
            else jnp.zeros((6, 6), jnp.float32)
        )
        return (
            transform, accepted, res.fitness, res.num_correspondences,
            res.iterations, hess,
        )

    def no_register(_):
        ident = se3.identity()
        return (
            ident,
            jnp.asarray(False),
            jnp.asarray(jnp.inf, jnp.float32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            jnp.zeros((6, 6), jnp.float32),
        )

    transform, accepted, fitness, n_corr, iters, hessian = jax.lax.cond(
        do_register, register, no_register, operand=None
    )

    new_pose = se3.normalize(se3.compose(state.pose, transform))
    new_accum = se3.normalize(se3.compose(state.accum, transform))

    # prev cloud/covs update on bootstrap or *successful* registration only —
    # on rejection the reference keeps the old cloud (icp_odometer.cpp keeps
    # prev_cloud_ unless converged && fitness ok), so the next registration
    # spans the full motion instead of silently dropping a step
    take_cloud = ~state.initialized | (do_register & accepted)
    sel = lambda new, old: jax.tree_util.tree_map(
        lambda a, b: jnp.where(take_cloud, a, b), new, old
    )
    new_prev_cloud = sel(filtered, state.prev_cloud)
    new_prev_covs = jnp.where(take_cloud, covs, state.prev_covs) if plane else state.prev_covs

    new_skip = jnp.where(
        skip,
        state.skip_count - 1,
        jnp.asarray(config.num_clouds_skip, jnp.int32),
    )

    new_last = Pose(
        t=jnp.where(accepted, transform.t, state.last_transform.t),
        q=jnp.where(accepted, transform.q, state.last_transform.q),
    )
    new_state = OdometryState(
        initialized=jnp.asarray(True),
        pose=new_pose,
        accum=new_accum,
        prev_cloud=new_prev_cloud,
        prev_covs=new_prev_covs,
        last_transform=new_last,
        skip_count=new_skip,
        scan_count=state.scan_count + 1,
    )
    out = OdometryOutput(
        pose=new_pose,
        transform=transform,
        processed=do_register,
        accepted=accepted,
        fitness=fitness,
        num_correspondences=n_corr,
        iterations=iters,
        num_voxels=num_voxels,
        filtered=filtered,
        filtered_covs=covs,
        hessian=hessian,
    )
    return new_state, out
