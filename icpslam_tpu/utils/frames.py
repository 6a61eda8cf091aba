"""Coordinate-frame registry — the tf-tree replacement.

The reference uses ROS tf for the map→odom→base_link→laser chain
(lookups at ``/root/reference/src/icpslam/icp_odometer.cpp:162-167``,
broadcast at ``src/icpslam/icpslam.cpp:100-105``). In a single-process
functional pipeline a full distributed transform tree is unnecessary; this
registry keeps the same *model* — a tree of named frames with a pose per
edge — and supports lookup between any two frames by composing along the
tree, so sensor extrinsics (laser-in-robot) and the published map→odom
correction live in one place.

Host-side utility (plain Python dict of jnp poses); the hot path never
touches it — extrinsics are baked into the scan transform at ingest.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from icpslam_tpu.geometry import se3
from icpslam_tpu.geometry.se3 import Pose


class FrameGraph:
    """Tree of frames: each child has one parent and a parent←child pose."""

    def __init__(self):
        self._parent: Dict[str, Tuple[str, Pose]] = {}

    def set_transform(self, parent: str, child: str, pose: Pose) -> None:
        """Register/update pose of ``child`` expressed in ``parent``."""
        if child in self._parent and self._parent[child][0] != parent:
            raise ValueError(
                f"frame '{child}' already attached to '{self._parent[child][0]}'"
            )
        # cycle guard: child must not be an ancestor of parent
        if child != parent and self._is_ancestor(child, parent):
            raise ValueError(f"{parent}->{child} would create a cycle")
        self._parent[child] = (parent, pose)

    def _is_ancestor(self, frame: str, of: str) -> bool:
        cur = of
        while cur in self._parent:
            cur = self._parent[cur][0]
            if cur == frame:
                return True
        return False

    def _path_to_root(self, frame: str) -> List[str]:
        path = [frame]
        while path[-1] in self._parent:
            path.append(self._parent[path[-1]][0])
        return path

    def _pose_to_ancestor(self, frame: str, ancestor: str) -> Pose:
        pose = se3.identity()
        cur = frame
        while cur != ancestor:
            parent, rel = self._parent[cur]
            pose = se3.compose(rel, pose)
            cur = parent
        return pose

    def lookup(self, target: str, source: str) -> Pose:
        """Pose of ``source`` expressed in ``target`` (tf lookupTransform
        argument order). Raises KeyError when the frames are not connected."""
        if target == source:
            return se3.identity()
        tpath = self._path_to_root(target)
        spath = self._path_to_root(source)
        common: Optional[str] = None
        tset = set(tpath)
        for f in spath:
            if f in tset:
                common = f
                break
        if common is None:
            raise KeyError(f"frames '{target}' and '{source}' are not connected")
        t_in_common = self._pose_to_ancestor(target, common)
        s_in_common = self._pose_to_ancestor(source, common)
        return se3.compose(se3.inverse(t_in_common), s_in_common)

    def frames(self) -> List[str]:
        roots = {p for p, _ in self._parent.values()} - set(self._parent)
        return sorted(set(self._parent) | roots)


def default_frame_graph(config, laser_in_robot: Optional[Pose] = None) -> FrameGraph:
    """The reference's frame chain: map → odom → base → laser
    (``config/icpslam.yaml:6-10``)."""
    g = FrameGraph()
    g.set_transform(config.map_frame, config.odom_frame, se3.identity())
    g.set_transform(config.odom_frame, config.robot_frame, se3.identity())
    g.set_transform(
        config.robot_frame,
        config.laser_frame,
        laser_in_robot if laser_in_robot is not None else se3.identity(),
    )
    return g
