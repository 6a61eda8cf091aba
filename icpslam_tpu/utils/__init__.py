from icpslam_tpu.utils import logging  # noqa: F401
from icpslam_tpu.utils.logging import Logger  # noqa: F401
