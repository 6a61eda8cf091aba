"""End-to-end demo: full SLAM on a synthetic city block with a
figure-eight trajectory (self-intersecting → mid-sequence loop closures).

Exports every product the reference visualizes in rviz as files:
trajectory (TUM), re-rendered global map (PLY), pose-graph (JSON).

    python examples/synthetic_city.py [--cpu] [--poses 120] [--out-dir out/]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--poses", type=int, default=120)
    ap.add_argument("--scan-points", type=int, default=12000)
    ap.add_argument("--out-dir", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from icpslam_tpu.config import IcpConfig, SlamConfig
    from icpslam_tpu.eval import metrics
    from icpslam_tpu.geometry import se3
    from icpslam_tpu.io import synthetic
    from icpslam_tpu.io.runner import run_slam
    from icpslam_tpu.utils import checkpoint
    from icpslam_tpu.utils.logging import Logger
    from icpslam_tpu.viz import export as viz

    cfg = SlamConfig(
        voxel_leaf_size=0.25,
        map_resolution=0.25,
        icp_odometry=IcpConfig(mode="plane", max_iterations=10),
        icp_mapping=IcpConfig(mode="point", max_iterations=20),
        max_points=8192,
        max_raw_points=16384,
        max_map_points=131072,
        max_keyframes=256,
        max_edges=1024,
        keyframe_distance=0.5,
        loop_closure_radius=4.0,
        loop_closure_min_id_gap=10,
    )
    log = Logger(level=1)

    world = synthetic.make_street_grid_world(seed=0, n_points=80000)
    gt = synthetic.make_figure_eight_trajectory(n_poses=args.poses)
    scans = synthetic.scan_stream(
        world, gt, capacity=cfg.max_raw_points, max_range=18.0,
        n_points=args.scan_points, noise=0.02, seed=0,
    )
    log.info(f"running {args.poses} scans over a figure-eight "
             f"({float(np.ptp(np.asarray(gt.t[:, 0]))):.0f} m wide)")

    res = run_slam(scans, cfg, initial_pose=se3.index(gt, 0), logger=log)
    n = res.trajectory.t.shape[0]

    ate_rmse, _ = metrics.ate(res.trajectory, gt, align=True)
    t_rpe, r_rpe = metrics.rpe(res.trajectory, gt)
    summary = {
        "scans": n,
        "wall_s": round(res.wall_time, 2),
        "scans_per_sec_incl_compile": round(n / res.wall_time, 2),
        "keyframes": int(res.state.keyframes.count),
        "loop_closures": int(res.state.num_loop_closures),
        "optimizations": int(res.state.num_optimizations),
        "edge_overflow": int(res.state.edges.overflow),
        "ate_m": round(ate_rmse, 4),
        "rpe_t_m": round(t_rpe, 4),
        "rpe_r_rad": round(r_rpe, 5),
    }
    print(json.dumps(summary))

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
        viz.export_trajectory_tum(os.path.join(args.out_dir, "trajectory.txt"), res.trajectory)
        viz.export_trajectory_tum(os.path.join(args.out_dir, "ground_truth.txt"), gt)
        viz.export_pose_graph_json(os.path.join(args.out_dir, "graph.json"), res.state)
        rendered = checkpoint.rerender_map(res.state, cfg)
        n_pts = viz.save_ply(
            os.path.join(args.out_dir, "map.ply"), rendered.map.as_cloud()
        )
        checkpoint.save(os.path.join(args.out_dir, "state.npz"), res.state)
        from icpslam_tpu.viz import html as viz_html

        viz_html.export_state_html(
            os.path.join(args.out_dir, "viewer.html"),
            rendered,
            trajectory=res.trajectory,
            ground_truth=gt,
            title="icpslam_tpu — synthetic city",
        )
        log.info(
            f"exported trajectory, graph, {n_pts}-point map, checkpoint, "
            f"viewer.html to {args.out_dir}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
