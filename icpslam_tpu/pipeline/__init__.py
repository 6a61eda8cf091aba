from icpslam_tpu.pipeline import odometry, slam  # noqa: F401
