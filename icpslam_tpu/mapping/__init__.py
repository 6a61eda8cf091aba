from icpslam_tpu.mapping import backend, point_map, voxel_map, scan_to_map  # noqa: F401
from icpslam_tpu.mapping.voxel_map import VoxelMap, empty_map  # noqa: F401
