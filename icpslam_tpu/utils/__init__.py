from icpslam_tpu.utils import checkpoint, frames, logging, profiling  # noqa: F401
from icpslam_tpu.utils.logging import Logger  # noqa: F401
