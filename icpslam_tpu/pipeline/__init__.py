from icpslam_tpu.pipeline import odometry, robot_odometry, slam  # noqa: F401
