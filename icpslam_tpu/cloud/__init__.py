from icpslam_tpu.cloud.pointcloud import (  # noqa: F401
    PointCloud,
    empty,
    from_points,
    to_numpy,
    transform,
    masked_centroid,
)
from icpslam_tpu.cloud.voxel import voxel_downsample, voxel_coords  # noqa: F401
