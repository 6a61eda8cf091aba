from icpslam_tpu.parallel import mesh, dist_graph, dist_step, multihost, sharded_map, sharded_nn  # noqa: F401
