from icpslam_tpu.geometry import quaternion  # noqa: F401
from icpslam_tpu.geometry import se3  # noqa: F401
from icpslam_tpu.geometry.se3 import Pose  # noqa: F401
