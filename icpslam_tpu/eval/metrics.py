"""Trajectory evaluation: ATE and RPE.

The reference publishes no metrics and has no evaluation code (SURVEY.md
§6); these are the standard definitions (Sturm et al., TUM benchmark) the
framework's BASELINE targets are expressed in:

- ATE: RMSE of translational error after optimal SE(3) (optionally Sim(3))
  alignment of the estimate to ground truth (Umeyama/Horn).
- RPE: RMSE of relative-pose error over a fixed frame delta.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from icpslam_tpu.geometry import se3
from icpslam_tpu.geometry.se3 import Pose
from icpslam_tpu.ops.kabsch import weighted_rigid_align


def align_trajectories(est: Pose, gt: Pose) -> Pose:
    """Best SE(3) ``T`` aligning estimate positions to ground truth
    (``gt ≈ T ∘ est``), via weighted Kabsch on the position sequences."""
    n = est.t.shape[0]
    T, _ = weighted_rigid_align(est.t, gt.t, jnp.ones((n,), est.t.dtype))
    return T


def ate(est: Pose, gt: Pose, align: bool = True) -> Tuple[float, np.ndarray]:
    """Absolute trajectory error. Returns (rmse, per-frame errors)."""
    if align:
        T = align_trajectories(est, gt)
        est_t = se3.transform_points(T, est.t)
    else:
        est_t = est.t
    err = np.linalg.norm(np.asarray(est_t) - np.asarray(gt.t), axis=-1)
    return float(np.sqrt(np.mean(err**2))), err


def rpe(est: Pose, gt: Pose, delta: int = 1) -> Tuple[float, float]:
    """Relative pose error over frame delta.

    Returns (translation rmse per delta, rotation rmse radians per delta).
    """
    n = est.t.shape[0]
    if n <= delta:
        raise ValueError("trajectory too short for requested delta")
    a = Pose(t=est.t[:-delta], q=est.q[:-delta])
    b = Pose(t=est.t[delta:], q=est.q[delta:])
    ga = Pose(t=gt.t[:-delta], q=gt.q[:-delta])
    gb = Pose(t=gt.t[delta:], q=gt.q[delta:])
    rel_est = se3.relative(a, b)
    rel_gt = se3.relative(ga, gb)
    err = se3.relative(rel_gt, rel_est)
    terr = np.linalg.norm(np.asarray(err.t), axis=-1)
    rerr = np.asarray(se3.distance_rotation(rel_gt, rel_est))
    return float(np.sqrt(np.mean(terr**2))), float(np.sqrt(np.mean(rerr**2)))
