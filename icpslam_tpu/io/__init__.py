from icpslam_tpu.io import synthetic  # noqa: F401
