from icpslam_tpu.graph import keyframes, pose_graph  # noqa: F401
