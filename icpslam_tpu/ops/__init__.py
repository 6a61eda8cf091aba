from icpslam_tpu.ops import nn, kabsch, covariance, icp, linalg3  # noqa: F401
from icpslam_tpu.ops.icp import IcpResult  # noqa: F401
