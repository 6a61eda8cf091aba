"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: GICP scan-to-scan odometry throughput (scans/sec) through the
full jitted odometry step — voxel filter + covariance estimation + 10-iter
plane-to-plane ICP — at KITTI-like sizes (raw scans ~32k points, ~8k
voxel-filtered), on whatever device JAX selects (the real TPU chip under
the driver; CPU with --cpu).

``vs_baseline`` compares against the reference operating point: PCL GICP
at 10 iterations on clouds this size runs at roughly 10 scans/s on a
desktop CPU core (no published numbers exist — BASELINE.md documents that
the baseline must be established; 10 scans/s is the conservative estimate
the ≥10x target in BASELINE.json is measured against).

Usage: python bench.py [--cpu] [--scans N] [--json-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


REFERENCE_SCANS_PER_SEC = 10.0  # documented estimate for PCL GICP, see above


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--scans", type=int, default=30, help="timed scans")
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--json-only", action="store_true")
    ap.add_argument(
        "--refresh", type=int, default=1,
        help="ICP correspondence_refresh (1 = PCL-parity fresh NN every iter)",
    )
    ap.add_argument("--suite", action="store_true", help="also report graph-solve latency (stderr)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        # env vars are too late once sitecustomize registered the TPU
        # plugin; the config API still switches the platform.
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from icpslam_tpu.cloud import pointcloud as pc
    from icpslam_tpu.config import IcpConfig, SlamConfig
    from icpslam_tpu.geometry import se3
    from icpslam_tpu.io import synthetic
    from icpslam_tpu.pipeline import odometry

    dev = jax.devices()[0]
    if not args.json_only:
        print(f"# device: {dev}", file=sys.stderr)

    cfg = SlamConfig(
        voxel_leaf_size=0.2,
        icp_odometry=IcpConfig(
            mode="plane", max_iterations=10,
            correspondence_refresh=args.refresh,
        ),
        max_points=8192,
        max_raw_points=32768,
    )

    # KITTI-like synthetic stream: big room, ~32k-point scans
    world = synthetic.make_room_world(seed=0, n_points=200000, size=40.0, height=4.0)
    gt = synthetic.make_loop_trajectory(
        n_poses=args.warmup + args.scans, radius=12.0, laps=0.5
    )
    scans = [
        jax.device_put(s, dev)
        for s in synthetic.scan_stream(
            world, gt, capacity=cfg.max_raw_points, max_range=25.0,
            n_points=30000, noise=0.02, seed=0,
        )
    ]

    # Chunked driving (lax.scan over CHUNK scans per device call) — the
    # production ingest pattern: the host stacks the next chunk while the
    # device runs the current one. Worth ~1.4 ms/scan over step-by-step
    # dispatch on the tunneled chip.
    CHUNK = 10
    assert args.scans % CHUNK == 0, "--scans must be a multiple of 10"
    run = jax.jit(odometry.run_scans, static_argnums=(2,), donate_argnums=(0,))
    state = jax.device_put(odometry.init_state(cfg, se3.index(gt, 0)), dev)

    def stack(cs):
        import jax.tree_util as jtu
        return jtu.tree_map(lambda *x: jnp.stack(x), *cs)

    import jax.numpy as jnp
    warm_chunk = stack(scans[: args.warmup] * ((CHUNK + args.warmup - 1) // args.warmup))
    warm_chunk = jax.tree_util.tree_map(lambda x: x[:CHUNK], warm_chunk)
    chunks = [
        stack(scans[args.warmup + i : args.warmup + i + CHUNK])
        for i in range(0, args.scans, CHUNK)
    ]

    # warmup / compile
    state, out = run(state, warm_chunk, cfg)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for ch in chunks:
        state, out = run(state, ch, cfg)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    scans_per_sec = args.scans / dt
    result = {
        "metric": "gicp_odometry_scans_per_sec",
        "value": round(scans_per_sec, 3),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / REFERENCE_SCANS_PER_SEC, 3),
    }
    print(json.dumps(result))

    if args.suite:
        # secondary metrics (stderr — stdout stays one JSON line)
        _bench_full_slam(jax, np, cfg, scans, gt)
        _bench_suite(jax, np)
    return 0


def _bench_full_slam(jax, np, cfg, scans, gt):
    """Full slam_step throughput (odometry + scan-to-map + keyframes/graph)
    on the same scan stream as the headline; printed to stderr."""
    from icpslam_tpu.geometry import se3
    from icpslam_tpu.pipeline import slam

    import jax.numpy as jnp
    import jax.tree_util as jtu

    # NOTE: no donate_argnums here — donating the full SlamState pytree
    # trips an INVALID_ARGUMENT in the tunneled TPU backend (the smaller
    # odometry state donates fine); memory is ample without it. Driven
    # step-by-step: chunked lax.scan driving measured *slower* for the
    # full pipeline on this backend (large carried state), unlike the
    # odometry headline where chunking wins.
    step = jax.jit(slam.slam_step, static_argnums=(2,))
    state = slam.init_state(cfg, se3.index(gt, 0))
    n_warm = min(3, len(scans) - 1)
    for i in range(n_warm):
        state, out = step(state, scans[i], cfg)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for i in range(n_warm, len(scans)):
        state, out = step(state, scans[i], cfg)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "full_slam_step_scans_per_sec",
                "value": round((len(scans) - n_warm) / dt, 3),
                "unit": "scans/s (incl. scan-to-map + keyframes + graph)",
            }
        ),
        file=sys.stderr,
    )


def _bench_suite(jax, np):
    """Graph-solve latency and full-pipeline throughput (BASELINE.md's
    secondary metrics); printed to stderr."""
    import jax.numpy as jnp

    from icpslam_tpu.geometry import se3
    from icpslam_tpu.graph import pose_graph as pg

    K, E = 512, 2048
    rng = np.random.RandomState(0)
    ii = np.arange(E) % (K - 1)
    edges = pg.EdgeSet(
        i=jnp.asarray(ii, jnp.int32),
        j=jnp.asarray(ii + 1, jnp.int32),
        rel_t=jnp.asarray(rng.randn(E, 3) * 0.1, jnp.float32),
        rel_q=se3.identity((E,)).q,
        info=jnp.broadcast_to(100 * jnp.eye(6), (E, 6, 6)),
        valid=jnp.ones(E, bool),
        count=jnp.asarray(E, jnp.int32),
        overflow=jnp.asarray(0, jnp.int32),
    )
    mask = jnp.ones(K, bool)

    def mknodes(seed):
        r = np.random.RandomState(seed)
        return se3.Pose(
            t=jnp.asarray(r.randn(K, 3), jnp.float32) * 5,
            q=se3.identity((K,)).q,
        )

    nodes_list = [mknodes(s) for s in range(12)]
    for name, solver in (("direct", "direct"), ("pcg", "pcg")):
        f = jax.jit(
            lambda n: pg.optimize(
                n, edges, mask, iterations=5, mode="lm", linear_solver=solver
            )
        )
        out = f(nodes_list[-1])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for n in nodes_list[:10]:
            out = f(n)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / 10 * 1000
        print(
            json.dumps(
                {
                    "metric": f"pose_graph_solve_ms_{name}",
                    "value": round(ms, 2),
                    "unit": "ms (K=512, E=2048, 5 LM iters)",
                }
            ),
            file=sys.stderr,
        )


if __name__ == "__main__":
    sys.exit(main())
