from icpslam_tpu.viz import export  # noqa: F401
