"""Tests for frame registry, viz exports, profiling, and the logger."""

import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icpslam_tpu import cloud as pc
from icpslam_tpu.config import IcpConfig, tiny_config
from icpslam_tpu.geometry import quaternion as quat
from icpslam_tpu.geometry import se3
from icpslam_tpu.geometry.se3 import Pose
from icpslam_tpu.io import synthetic
from icpslam_tpu.pipeline import slam
from icpslam_tpu.utils import profiling
from icpslam_tpu.utils.frames import FrameGraph, default_frame_graph
from icpslam_tpu.utils.logging import Logger
from icpslam_tpu.viz import export as viz
from icpslam_tpu.viz import html as viz_html


class TestFrameGraph:
    def test_chain_lookup(self):
        g = FrameGraph()
        g.set_transform("map", "odom", Pose(t=jnp.array([1.0, 0, 0]), q=quat.identity()))
        g.set_transform("odom", "base", Pose(t=jnp.array([0.0, 2.0, 0]), q=quat.identity()))
        p = g.lookup("map", "base")
        np.testing.assert_allclose(np.asarray(p.t), [1, 2, 0], atol=1e-6)

    def test_reverse_lookup(self):
        g = FrameGraph()
        g.set_transform("map", "odom", Pose(t=jnp.array([1.0, 0, 0]), q=quat.identity()))
        p = g.lookup("odom", "map")
        np.testing.assert_allclose(np.asarray(p.t), [-1, 0, 0], atol=1e-6)

    def test_sibling_lookup_through_common_parent(self):
        g = FrameGraph()
        g.set_transform("map", "a", Pose(t=jnp.array([1.0, 0, 0]), q=quat.identity()))
        g.set_transform("map", "b", Pose(t=jnp.array([0.0, 1.0, 0]), q=quat.identity()))
        p = g.lookup("a", "b")
        np.testing.assert_allclose(np.asarray(p.t), [-1, 1, 0], atol=1e-6)

    def test_rotation_composition(self):
        g = FrameGraph()
        rot90 = Pose(t=jnp.zeros(3), q=quat.from_rpy(0.0, 0.0, jnp.pi / 2))
        g.set_transform("map", "odom", rot90)
        g.set_transform("odom", "base", Pose(t=jnp.array([1.0, 0, 0]), q=quat.identity()))
        p = g.lookup("map", "base")
        np.testing.assert_allclose(np.asarray(p.t), [0, 1, 0], atol=1e-6)

    def test_disconnected_raises(self):
        g = FrameGraph()
        g.set_transform("map", "odom", se3.identity())
        g.set_transform("other", "thing", se3.identity())
        with pytest.raises(KeyError):
            g.lookup("odom", "thing")

    def test_cycle_rejected(self):
        g = FrameGraph()
        g.set_transform("a", "b", se3.identity())
        with pytest.raises(ValueError):
            g.set_transform("b", "a", se3.identity())

    def test_default_graph(self):
        cfg = tiny_config()
        g = default_frame_graph(cfg)
        assert set(g.frames()) >= {"map", "odom", "base_link", "laser"}
        p = g.lookup("map", "laser")
        np.testing.assert_allclose(np.asarray(p.t), 0.0, atol=1e-6)


class TestVizExport:
    def _run_small_slam(self):
        cfg = tiny_config(
            voxel_leaf_size=0.3, map_resolution=0.3,
            icp_odometry=IcpConfig(mode="point", max_iterations=10),
            icp_mapping=IcpConfig(mode="point", max_iterations=10),
            max_points=512, max_raw_points=2048, max_map_points=4096,
            max_keyframes=32, max_edges=64,
        )
        world = synthetic.make_room_world(seed=0, n_points=6000)
        gt = synthetic.make_loop_trajectory(n_poses=8, radius=5.0, laps=0.3)
        step = jax.jit(slam.slam_step, static_argnums=(2,))
        state = slam.init_state(cfg, initial_pose=se3.index(gt, 0))
        for scan in synthetic.scan_stream(world, gt, capacity=2048, n_points=600):
            state, _ = step(state, scan, cfg)
        return state

    def test_save_ply_roundtrip(self, tmp_path):
        pts = np.random.RandomState(0).randn(50, 3).astype(np.float32)
        cloud = pc.from_points(pts, capacity=64)
        path = os.path.join(tmp_path, "cloud.ply")
        n = viz.save_ply(path, cloud)
        assert n == 50
        raw = open(path, "rb").read()
        header_end = raw.index(b"end_header\n") + len(b"end_header\n")
        assert b"element vertex 50" in raw[:header_end]
        body = np.frombuffer(raw[header_end:], dtype="<f4").reshape(50, 3)
        np.testing.assert_allclose(body, pts, atol=1e-6)

    def test_export_trajectory_tum(self, tmp_path):
        poses = Pose(
            t=jnp.arange(9, dtype=jnp.float32).reshape(3, 3),
            q=jnp.tile(jnp.array([1.0, 0, 0, 0]), (3, 1)),
        )
        path = os.path.join(tmp_path, "traj.txt")
        n = viz.export_trajectory_tum(path, poses)
        lines = open(path).read().strip().split("\n")
        assert n == 3 and len(lines) == 3
        cols = lines[1].split()
        assert len(cols) == 8
        assert float(cols[1]) == 3.0  # tx of pose 1
        assert float(cols[7]) == 1.0  # qw last (TUM order)

    def test_export_pose_graph(self, tmp_path):
        state = self._run_small_slam()
        path = os.path.join(tmp_path, "graph.json")
        doc = viz.export_pose_graph_json(path, state)
        assert len(doc["nodes"]) == int(state.keyframes.count)
        assert len(doc["edges"]) >= len(doc["nodes"]) - 1
        loaded = json.load(open(path))
        assert loaded["nodes"][0]["ramp"] == 0.0
        assert loaded["nodes"][-1]["ramp"] == 1.0
        for e in loaded["edges"]:
            expect = "loop" if abs(e["i"] - e["j"]) > 2 else "sequential"
            assert e["type"] == expect

    @staticmethod
    def _extract_viewer_data(path):
        """Pull the injected DATA JSON back out of the viewer HTML."""
        text = open(path).read()
        start = text.index("const DATA = ") + len("const DATA = ")
        end = text.index(";\n", start)
        return json.loads(text[start:end])

    def test_export_html_layers_roundtrip(self, tmp_path):
        import base64

        pts = np.random.RandomState(1).randn(40, 3).astype(np.float32)
        traj = np.cumsum(np.ones((7, 3), np.float32), axis=0)
        layers = [
            viz_html.points_layer("map", pts, color_mode="height"),
            viz_html.line_layer("trajectory", traj, color=(0.2, 0.9, 1.0)),
        ]
        path = os.path.join(tmp_path, "view.html")
        viz_html.export_html(path, layers, title="t", stats={"scans": 7})
        doc = self._extract_viewer_data(path)
        assert doc["title"] == "t" and doc["stats"]["scans"] == 7
        assert [ly["name"] for ly in doc["layers"]] == ["map", "trajectory"]
        m = doc["layers"][0]
        decoded = np.frombuffer(base64.b64decode(m["pos"]), "<f4").reshape(-1, 3)
        np.testing.assert_allclose(decoded, pts, atol=1e-7)
        assert m["n"] == 40 and m["colorMode"] == "height"
        assert doc["layers"][1]["kind"] == "linestrip"
        # self-contained: no external resources referenced
        text = open(path).read()
        assert "http://" not in text and "https://" not in text

    def test_export_state_html(self, tmp_path):
        state = self._run_small_slam()
        path = os.path.join(tmp_path, "state.html")
        viz_html.export_state_html(path, state, title="run")
        doc = self._extract_viewer_data(path)
        names = [ly["name"] for ly in doc["layers"]]
        assert "graph nodes" in names
        nodes = doc["layers"][names.index("graph nodes")]
        assert nodes["n"] == int(state.keyframes.count)
        assert doc["stats"]["keyframes"] == int(state.keyframes.count)
        if int(state.map.size) > 0:
            assert "map" in names
            assert doc["layers"][names.index("map")]["n"] == int(state.map.size)
        # edge segment layers carry 2 vertices per edge
        for ly in doc["layers"]:
            if ly["kind"] == "lines":
                assert ly["n"] % 2 == 0 and ly["n"] > 0


class TestProfiling:
    def test_stage_timer(self):
        st = profiling.StageTimer()
        x = jnp.ones((64, 64))
        f = jax.jit(lambda a: a @ a)
        st.time_stage("matmul", f, x)
        st.time_stage("matmul", f, x)
        s = st.summary()
        assert s["matmul"]["count"] == 2
        assert s["matmul"]["total_s"] > 0
        assert "matmul" in st.report()

    def test_annotate_and_stage_cm(self):
        st = profiling.StageTimer()
        with st.stage("region"):
            with profiling.annotate("inner"):
                _ = jnp.sum(jnp.ones(16))
        assert st.counts["region"] == 1


class TestLogger:
    def test_levels(self):
        buf = io.StringIO()
        log = Logger(level=1, stream=buf)
        log.info("hello")
        log.debug("hidden")
        out = buf.getvalue()
        assert "hello" in out and "hidden" not in out
        buf2 = io.StringIO()
        Logger(level=0, stream=buf2).warn("silent")
        assert buf2.getvalue() == ""


class TestMarkerStyling:
    """The reference's marker-styling yaml keys (icpslam.yaml:27-31) are
    real config since r4: honored by the HTML viewer's layers."""

    def _state_with_graph(self, cfg):
        import jax.numpy as jnp

        from icpslam_tpu.geometry import se3
        from icpslam_tpu.graph import pose_graph as pg
        from icpslam_tpu.pipeline import slam

        st = slam.init_state(cfg)
        store = st.keyframes
        t = jnp.zeros((store.capacity, 3)).at[:4, 0].set(jnp.arange(4.0))
        store = store._replace(
            pose_graph=store.pose_graph._replace(t=t),
            pose_odom=store.pose_odom._replace(t=t + 0.1),
            count=jnp.asarray(4, jnp.int32),
        )
        edges = st.edges
        for k in range(3):
            edges = pg.add_edge(edges, k, k + 1, se3.identity(), jnp.eye(6))
        return st._replace(keyframes=store, edges=edges)

    def test_configured_styles_reach_layers(self):
        from icpslam_tpu import config as cfg_mod
        from icpslam_tpu.viz import html as viz_html

        c = cfg_mod.tiny_config(
            marker_scale_nodes=0.2, marker_scale_edges=0.15,
            icp_nodes_markers_color=(1.0, 0.0, 1.0, 1.0),
            odom_nodes_markers_color=(1.0, 0.5, 0.0, 1.0),
            edges_markers_color=(0.1, 0.9, 0.1, 1.0),
        )
        layers = {L["name"]: L for L in viz_html.graph_layers(
            self._state_with_graph(c), config=c)}
        assert layers["graph nodes"]["pointSize"] == 16.0  # 0.2/0.1 * 8
        assert layers["graph nodes"]["color"] == [1.0, 0.0, 1.0]
        assert "odom nodes" in layers  # reference's second node set
        assert layers["sequential edges"]["color"] == [0.1, 0.9, 0.1]
        assert layers["sequential edges"]["width"] > 1.0

    def test_reference_defaults_keep_ramp(self):
        from icpslam_tpu import config as cfg_mod
        from icpslam_tpu.viz import html as viz_html

        c = cfg_mod.tiny_config()
        layers = {L["name"]: L for L in viz_html.graph_layers(
            self._state_with_graph(c), config=c)}
        assert layers["graph nodes"]["colorMode"] == "rgb"  # id ramp
        assert "odom nodes" not in layers

    def test_reference_yaml_marker_keys_load(self):
        from icpslam_tpu import config as cfg_mod

        ref = cfg_mod.from_yaml("/root/reference/config/icpslam.yaml")
        assert ref.marker_scale_nodes == 0.1
        assert tuple(ref.edges_markers_color) == (0.0, 0.0, 1.0, 1.0)
