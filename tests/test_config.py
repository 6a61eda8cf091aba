"""Config system tests: YAML loading (incl. the reference's own yaml
keys, ``/root/reference/config/icpslam.yaml:1-31``), round-trips, typo
safety, and the runner's --config override precedence."""

import os
import textwrap

import pytest

from icpslam_tpu import config as C


REFERENCE_STYLE_YAML = textwrap.dedent(
    """
    # the reference's key names must load unchanged (alias map)
    verbosity_level: 2
    world_frame: world
    map_frame: map
    odom_frame: odom
    robot_frame: base_link
    laser_frame: laser
    num_clouds_skip: 5
    voxel_leaf_size: 0.25
    octree_resolution: 0.3
    wheel_odom_information_matrix: [0.2, 0.2, 100.0, 0.5, 0.5, 0.1]
    icp_information_matrix: [0.06, 0.06, 10.0, 0.001, 0.001, 2.0]
    loop_information_matrix: [0.1, 0.1, 5.0, 0.05, 0.05, 0.05]
    keyframes_window: 6
    publish_map_transform: true
    marker_scale_nodes: 0.1
    marker_scale_edges: 0.05
    icp_nodes_markers_color: [0.0, 1.0, 0.0, 1.0]
    odom_nodes_markers_color: [0.0, 0.5, 0.5, 1.0]
    edges_markers_color: [0.0, 0.0, 1.0, 1.0]
    """
)


class TestYamlConfig:
    def test_reference_keys_load(self, tmp_path):
        path = os.path.join(tmp_path, "ref.yaml")
        with open(path, "w") as f:
            f.write(REFERENCE_STYLE_YAML)
        cfg = C.from_yaml(path)
        assert cfg.verbosity == 2
        assert cfg.num_clouds_skip == 5
        assert cfg.voxel_leaf_size == 0.25
        assert cfg.map_resolution == 0.3            # octree_resolution
        assert cfg.keyframes_window == 6
        assert cfg.icp_information == (0.06, 0.06, 10.0, 0.001, 0.001, 2.0)
        assert cfg.odometry_information[2] == 100.0  # wheel_odom matrix
        assert cfg.loop_information[2] == 5.0
        assert cfg.publish_map_transform is True

    def test_overrides_act_as_launch_args(self, tmp_path):
        path = os.path.join(tmp_path, "ref.yaml")
        with open(path, "w") as f:
            f.write(REFERENCE_STYLE_YAML)
        cfg = C.from_yaml(path, voxel_leaf_size=0.5, max_keyframes=64)
        assert cfg.voxel_leaf_size == 0.5
        assert cfg.max_keyframes == 64

    def test_nested_icp_config(self, tmp_path):
        path = os.path.join(tmp_path, "c.yaml")
        with open(path, "w") as f:
            f.write("icp_odometry:\n  mode: point\n  max_iterations: 7\n")
        cfg = C.from_yaml(path)
        assert cfg.icp_odometry.mode == "point"
        assert cfg.icp_odometry.max_iterations == 7
        # untouched fields keep their defaults
        assert cfg.icp_mapping.max_iterations == 30

    def test_unknown_key_raises(self, tmp_path):
        path = os.path.join(tmp_path, "bad.yaml")
        with open(path, "w") as f:
            f.write("voxel_leafsize: 0.3\n")  # typo
        with pytest.raises(KeyError):
            C.from_yaml(path)
        with pytest.raises(KeyError):
            C.from_dict({"icp_odometry": {"mode": "point", "bogus": 1}})

    def test_save_load_roundtrip(self, tmp_path):
        cfg = C.kitti_config(max_keyframes=128, verbosity=0)
        path = os.path.join(tmp_path, "rt.yaml")
        C.save_yaml(cfg, path)
        assert C.from_yaml(path) == cfg

    def test_shipped_configs_load(self):
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        assert C.from_yaml(os.path.join(root, "configs", "default.yaml")) == C.SlamConfig()
        assert C.from_yaml(os.path.join(root, "configs", "kitti.yaml")) == C.kitti_config()


class TestRunnerConfigFlag:
    def test_cli_overrides_yaml(self, tmp_path, capsys):
        import json

        from icpslam_tpu.io import runner

        path = os.path.join(tmp_path, "run.yaml")
        C.save_yaml(
            C.SlamConfig(
                voxel_leaf_size=0.3, map_resolution=0.3, max_points=512,
                max_raw_points=4096, max_map_points=4096, max_keyframes=16,
                keyframe_distance=0.5, verbosity=0,
            ),
            path,
        )
        rc = runner.main(
            ["--synthetic", "--poses", "6", "--config", path,
             "--keyframe-distance", "1.0"]
        )
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["scans"] == 6
