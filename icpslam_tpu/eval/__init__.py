from icpslam_tpu.eval import metrics  # noqa: F401
