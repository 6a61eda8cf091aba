"""Scaling-efficiency harness (BASELINE.md metric 4: ≥75% at 2+ hosts).

Times the multi-device batch pipeline (DP-sharded vmapped GICP
registration + distributed graph solve, ``parallel/dist_step``) at a
ladder of device counts on whatever backend is available and reports

    {"devices": n, "scans_per_sec": s, "efficiency": e}

per rung, where efficiency is *weak-scaling* efficiency: each device
carries a fixed number of scan pairs, so ``e = (s_n / n) / s_1`` — the
fraction of perfect linear scaling retained. This is the honest framing
for the SLAM workload (more devices ⇒ a bigger map / more concurrent
registrations, SURVEY.md §5.7), and the harness + math + artifact format
run unchanged from 8 virtual CPU devices (CI) to a real pod slice, where
the numbers become meaningful.

Also reports strong-scaling solve latency for the distributed pose-graph
solvers at a fixed graph size (the reference's blocking g2o solve,
``/root/reference/src/icpslam/icpslam.cpp:171``, is the single-process
analog).

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m icpslam_tpu.parallel.scaling --devices 1,2,4,8
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import List, Optional, Sequence

import numpy as np


def _render_pairs(n_pairs: int, capacity: int, n_points: int, seed: int = 0):
    """Host-rendered consecutive scan pairs over a synthetic world.

    Two distinct pair-batches are returned so timing loops can alternate
    inputs (identical repeated inputs report absurdly low times through
    an async/tunneled backend — CLAUDE.md measurement rule).
    """
    import jax.numpy as jnp

    from icpslam_tpu import cloud as pc
    from icpslam_tpu.io import synthetic

    world = synthetic.make_room_world(seed=seed, n_points=40000, size=24.0)
    gt = synthetic.make_loop_trajectory(n_poses=2 * n_pairs + 2, radius=7.0, laps=0.8)
    t_np, q_np = np.asarray(gt.t), np.asarray(gt.q)
    clouds = [
        pc.from_points(
            synthetic.render_scan(
                world, t_np[i], q_np[i], n_points=n_points,
                max_range=20.0, noise=0.01, seed=i,
            ),
            capacity=capacity,
        )
        for i in range(2 * n_pairs + 2)
    ]

    def batch(lo):
        src = clouds[lo + 1 : lo + 1 + n_pairs]
        tgt = clouds[lo : lo + n_pairs]
        return (
            jnp.stack([c.points for c in src]),
            jnp.stack([c.mask for c in src]),
            jnp.stack([c.points for c in tgt]),
            jnp.stack([c.mask for c in tgt]),
        )

    return batch(0), batch(1)


def measure_scaling(
    device_counts: Sequence[int],
    pairs_per_device: int = 2,
    n_points: int = 3000,
    capacity: int = 4096,
    repeats: int = 4,
    solver_nodes: int = 64,
    icp_mode: str = "plane",
) -> List[dict]:
    """Weak-scaling throughput + strong-scaling solver latency ladder.

    Each rung re-jits the batched step for its mesh; compile time is
    excluded (one warmup call per distinct input batch). Total pairs at
    rung ``n`` is ``n * pairs_per_device``.
    """
    import jax
    import jax.numpy as jnp

    from icpslam_tpu.config import IcpConfig
    from icpslam_tpu.geometry import se3
    from icpslam_tpu.graph import pose_graph as pg
    from icpslam_tpu.parallel import dist_graph, dist_step, mesh as mesh_lib

    avail = len(jax.devices())
    counts = [n for n in device_counts if n <= avail]
    dropped = [n for n in device_counts if n > avail]
    if dropped:
        print(
            json.dumps({
                "metric": "scaling_rungs_dropped",
                "value": dropped,
                "reason": f"only {avail} devices available",
            }),
            file=sys.stderr,
        )
    if not counts:
        return []
    icfg = IcpConfig(mode=icp_mode, max_iterations=5, covariance_knn=8)

    max_pairs = max(counts) * pairs_per_device
    batch_a, batch_b = _render_pairs(max_pairs, capacity, n_points)

    # fixed-size noisy loop-closed solver graph (strong scaling)
    K = solver_nodes
    rng = np.random.RandomState(0)
    E = K + K // 4
    ii = np.concatenate([np.arange(K - 1), rng.randint(0, K // 2, E - (K - 1))])
    jj = np.concatenate([
        np.arange(1, K), np.minimum(ii[K - 1 :] + K // 2, K - 1)
    ])
    edges = pg.EdgeSet(
        i=jnp.asarray(ii, jnp.int32),
        j=jnp.asarray(jj, jnp.int32),
        rel_t=jnp.asarray(rng.randn(E, 3) * 0.1, jnp.float32),
        rel_q=se3.identity((E,)).q,
        info=jnp.broadcast_to(100.0 * jnp.eye(6), (E, 6, 6)),
        valid=jnp.ones((E,), bool),
        count=jnp.asarray(E, jnp.int32),
        overflow=jnp.asarray(0, jnp.int32),
    )
    # several distinct node sets: identical-input repeated calls through
    # an async/tunneled backend report absurdly low times (CLAUDE.md
    # measurement rule — same reason the throughput loop alternates)
    node_sets = [
        se3.Pose(
            t=jnp.asarray(rng.randn(K, 3) * 2.0, jnp.float32),
            q=se3.identity((K,)).q,
        )
        for _ in range(4)
    ]
    node_mask = jnp.ones((K,), bool)

    results = []
    base_per_dev = None
    for n in counts:
        mesh = mesh_lib.make_mesh(n)
        B = n * pairs_per_device
        step = dist_step.make_batched_step(icfg, mesh)
        shard = mesh_lib.shard_leading(mesh)

        def place(batch):
            return tuple(jax.device_put(x[:B], shard) for x in batch)

        pa, pb = place(batch_a), place(batch_b)

        def timed(step_fn):
            jax.block_until_ready(step_fn(*pa))  # compile + warm
            jax.block_until_ready(step_fn(*pb))
            t0 = time.perf_counter()
            for r in range(repeats):
                out = step_fn(*(pa if r % 2 == 0 else pb))
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / repeats

        dt = timed(step)
        sps = B / dt

        # comm-vs-compute attribution (VERDICT r3 weak #2): re-jit the
        # SAME rung with every EXPLICIT collective replaced by a
        # shape-preserving local no-op (dist_graph.ABLATE_COLLECTIVES) —
        # identical per-device FLOPs. collective_ms is the difference.
        # NOTE: SPMD-inserted communication (the trajectory chaining's
        # sharded associative scan, output replication) is NOT ablated,
        # so collective_ms is a LOWER bound on true communication time;
        # the explicit collectives — the solver psums/all_gathers AND the
        # sharded-map NN pmin/psum reduce (sharded_map.approx_nn, routed
        # through the same shim since r5) — are all covered.
        step_abl = None
        try:
            dist_graph.ABLATE_COLLECTIVES = True
            step_abl = dist_step.make_batched_step(icfg, mesh)
            dt_abl = timed(step_abl)
        finally:
            dist_graph.ABLATE_COLLECTIVES = False
        compute_ms = dt_abl * 1000.0
        collective_ms = max(dt - dt_abl, 0.0) * 1000.0

        solve_ms = {}
        for solver in ("direct", "pcg", "schur"):
            f = jax.jit(
                lambda nd, s=solver, m=mesh: dist_graph.optimize(
                    nd, edges, node_mask, m, iterations=5, mode="lm",
                    linear_solver=s, sep_capacity=K,
                )
            )
            jax.block_until_ready(f(node_sets[0]))
            t0 = time.perf_counter()
            for r in range(3):
                o = f(node_sets[1 + r % (len(node_sets) - 1)])
            jax.block_until_ready(o)
            solve_ms[solver] = (time.perf_counter() - t0) / 3 * 1000.0

        per_dev = sps / n
        if base_per_dev is None:
            base_per_dev = per_dev
        results.append({
            "devices": n,
            "pairs": B,
            "scans_per_sec": round(sps, 3),
            "efficiency": round(per_dev / base_per_dev, 4),
            # efficiency is normalized to the SMALLEST rung measured —
            # only a true linear-scaling fraction when that rung is 1
            # device (include 1 in --devices for BASELINE metric 4)
            "efficiency_vs_devices": counts[0],
            # per-rung attribution: step time with collectives ablated
            # (= pure per-device compute at this rung's batch) vs the
            # collective cost the real step adds on top
            "compute_ms": round(compute_ms, 3),
            "collective_ms": round(collective_ms, 3),
            "collective_frac": round(
                collective_ms / max(compute_ms + collective_ms, 1e-9), 4
            ),
            "solve_ms": {k: round(v, 3) for k, v in solve_ms.items()},
        })
    return results


def main(argv: Optional[list] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=str, default="1,2,4,8",
                    help="comma-separated mesh sizes to ladder over")
    ap.add_argument("--pairs-per-device", type=int, default=2)
    ap.add_argument("--points", type=int, default=3000)
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--solver-nodes", type=int, default=64)
    ap.add_argument("--icp-mode", choices=["point", "plane"], default="plane")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/icpslam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    counts = [int(x) for x in args.devices.split(",")]
    rungs = measure_scaling(
        counts,
        pairs_per_device=args.pairs_per_device,
        n_points=args.points,
        capacity=args.capacity,
        repeats=args.repeats,
        solver_nodes=args.solver_nodes,
        icp_mode=args.icp_mode,
    )
    result = {
        "metric": "scaling_efficiency",
        "backend": jax.default_backend(),
        "mode": "weak (fixed pairs/device); solver latency is strong "
        "(fixed graph)",
        "note": (
            "virtual-device CPU numbers validate the harness, not the "
            "hardware; run on a pod slice for BASELINE metric 4"
            if jax.default_backend() == "cpu" else "real-device measurement"
        ),
        "rungs": rungs,
        "value": rungs[-1]["efficiency"] if rungs else None,
        "unit": "fraction of linear scaling at the largest rung",
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
