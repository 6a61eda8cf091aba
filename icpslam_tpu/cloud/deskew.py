"""Device-side motion de-skew of spinning-lidar sweeps.

A mechanical lidar measures each return from wherever the platform is at
that azimuth's capture time, so a full sweep is smeared by the platform's
intra-sweep motion (the physics the proxy renderer reproduces,
``io/synthetic.py::render_velodyne_scan``). The reference pipeline has no
de-skew at all (PCL GICP consumes the raw cloud); LOAM-class systems undo
the smear at ingest. Two consumers here:

- the runner's ``--deskew`` (host, ``io/synthetic.deskew_scan``) uses an
  INS relative-motion measurement — the KITTI/OXTS operating mode;
- the *in-loop iterative* de-skew (``config.deskew_rounds``,
  ``pipeline/odometry.py``) runs THIS module inside the jitted odometry
  step with the registration's own motion estimate — no INS required.

Sweep fractions come from each point's azimuth (how real pipelines
timestamp returns when the driver strips per-point stamps): the scanner
sweeps [-π, π) once per period, so ``u = (atan2(y, x) + π) / 2π``.

The warp is the constant-velocity interpolation ``p' = R(u·θ)·p + u·t``
(axis fixed, angle scaled — the quaternion power q^u), evaluated in
Rodrigues component form on (N,) lane-aligned arrays (SoA, see
``ops/icp.py`` layout note).
"""

from __future__ import annotations

import jax.numpy as jnp

from icpslam_tpu.geometry.se3 import Pose


def sweep_fraction(points: jnp.ndarray) -> jnp.ndarray:
    """(N,) capture-time fraction in [0, 1) from point azimuth.

    Exact for raw sensor-frame clouds (the sensor reports ray angles);
    approximate after any rigid correction (a de-skewed point's azimuth
    drifts from its capture azimuth by the parallax of the intra-sweep
    motion — small at lidar ranges).
    """
    az = jnp.arctan2(points[:, 1], points[:, 0])
    return (az + jnp.pi) / (2.0 * jnp.pi)


def deskew_points(points: jnp.ndarray, u: jnp.ndarray, rel: Pose) -> jnp.ndarray:
    """Re-express sweep points in the sweep-START frame.

    ``rel`` is the sensor motion over the sweep (start→end); each point
    at fraction ``u`` is mapped through the interpolated pose
    ``T(u) = (u·t, q^u)``. Mirrors the host-side
    ``io/synthetic.deskew_scan`` (verified equivalent in tests) but runs
    under jit on (N,) component arrays.
    """
    px, py, pz = points[:, 0], points[:, 1], points[:, 2]
    q = rel.q
    # axis-angle of rel.q (shortest arc; w>=0 guard like quaternion.angle)
    w = jnp.abs(q[0])
    v = q[1:] * jnp.sign(jnp.where(q[0] == 0.0, 1.0, q[0]))
    s = jnp.linalg.norm(v)
    theta = 2.0 * jnp.arctan2(s, w)
    axis = v / jnp.maximum(s, 1e-12)
    ax, ay, az_ = axis[0], axis[1], axis[2]

    ang = u * theta                       # (N,) per-point rotation angle
    c, sn = jnp.cos(ang), jnp.sin(ang)
    # Rodrigues: p' = p·c + (a×p)·s + a·(a·p)·(1−c)
    dot = ax * px + ay * py + az_ * pz
    cx = ay * pz - az_ * py
    cy = az_ * px - ax * pz
    cz = ax * py - ay * px
    k = dot * (1.0 - c)
    rx = px * c + cx * sn + ax * k + u * rel.t[0]
    ry = py * c + cy * sn + ay * k + u * rel.t[1]
    rz = pz * c + cz * sn + az_ * k + u * rel.t[2]
    return jnp.stack([rx, ry, rz], axis=-1)
