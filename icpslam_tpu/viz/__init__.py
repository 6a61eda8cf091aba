from icpslam_tpu.viz import export, html  # noqa: F401
