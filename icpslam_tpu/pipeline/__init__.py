from icpslam_tpu.pipeline import odometry  # noqa: F401
