from icpslam_tpu.io import synthetic, kitti  # noqa: F401
