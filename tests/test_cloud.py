"""Tests for padded point clouds and the voxel-grid downsample, checked
against a brute-force numpy reference (SURVEY.md §4 unit-test plan)."""

import jax
import jax.numpy as jnp
import numpy as np

from icpslam_tpu import cloud as pc
from icpslam_tpu.cloud.voxel import voxel_downsample
from icpslam_tpu.geometry import se3, quaternion as quat


def numpy_voxel_filter(points, resolution):
    """Brute-force reference: mean of points per occupied voxel."""
    coords = np.floor(points / resolution).astype(np.int64)
    out = {}
    for c, p in zip(map(tuple, coords), points):
        out.setdefault(c, []).append(p)
    return {c: np.mean(np.stack(v), axis=0) for c, v in out.items()}


class TestPointCloud:
    def test_from_points_padding(self):
        pts = np.random.RandomState(0).randn(10, 3)
        c = pc.from_points(pts, capacity=16)
        assert c.capacity == 16
        assert int(c.count()) == 10
        np.testing.assert_allclose(pc.to_numpy(c), pts, atol=1e-6)
        np.testing.assert_allclose(np.asarray(c.points)[10:], 0.0)

    def test_transform_keeps_padding_zero(self):
        pts = np.random.RandomState(1).randn(5, 3)
        c = pc.from_points(pts, capacity=8)
        pose = se3.Pose(
            t=jnp.array([1.0, 2.0, 3.0]),
            q=quat.from_rpy(0.1, 0.2, 0.3),
        )
        out = pc.transform(pose, c)
        np.testing.assert_allclose(np.asarray(out.points)[5:], 0.0)
        expect = np.asarray(se3.transform_points(pose, jnp.asarray(pts, jnp.float32)))
        np.testing.assert_allclose(pc.to_numpy(out), expect, atol=1e-5)

    def test_masked_centroid(self):
        pts = np.array([[1.0, 0, 0], [3.0, 0, 0]])
        c = pc.from_points(pts, capacity=4)
        np.testing.assert_allclose(pc.masked_centroid(c), [2.0, 0, 0], atol=1e-6)


class TestVoxelDownsample:
    def test_matches_numpy_reference(self):
        rng = np.random.RandomState(2)
        pts = rng.uniform(-5, 5, size=(300, 3)).astype(np.float32)
        res = 0.7
        c = pc.from_points(pts, capacity=512)
        filtered, nvox = jax.jit(voxel_downsample, static_argnums=(2,))(c, res, 512)

        ref = numpy_voxel_filter(pts, res)
        assert int(nvox) == len(ref)
        got = pc.to_numpy(filtered)
        assert got.shape[0] == len(ref)
        # match centroids by voxel coordinate
        got_map = {tuple(np.floor(g / res).astype(np.int64)): g for g in got}
        assert set(got_map) == set(ref)
        for k, v in ref.items():
            np.testing.assert_allclose(got_map[k], v, atol=1e-5)

    def test_matches_numpy_reference_large_scale(self):
        # realistic magnitudes: 20k points over ±20 m at 0.2 m leaves —
        # exercises the cumsum-difference segment reduction's f32 noise
        # floor (voxel-relative offsets keep it ~1e-4 m, see voxel.py)
        rng = np.random.RandomState(7)
        pts = rng.uniform(-20, 20, size=(20000, 3)).astype(np.float32)
        res = 0.2
        c = pc.from_points(pts, capacity=32768)
        filtered, nvox = jax.jit(voxel_downsample, static_argnums=(2,))(
            c, res, 32768
        )
        # f32 flooring to match the kernel's cell assignment exactly
        keys = np.floor(pts / np.float32(res)).astype(np.int64)
        ref = {}
        for p, k in zip(pts, map(tuple, keys)):
            ref.setdefault(k, []).append(p)
        ref = {k: np.mean(v, axis=0) for k, v in ref.items()}
        assert int(nvox) == len(ref)
        got = pc.to_numpy(filtered)
        assert got.shape[0] == len(ref)
        got_map = {tuple(np.floor(g / np.float32(res)).astype(np.int64)): g
                   for g in got}
        # centroids can land a hair across a cell boundary from f32 noise;
        # match by value instead for the few misses
        hits = sum(1 for k in ref if k in got_map)
        assert hits >= 0.999 * len(ref), (hits, len(ref))
        for k, v in ref.items():
            if k in got_map:
                np.testing.assert_allclose(got_map[k], v, atol=5e-4)

    def test_negative_coordinates(self):
        # floor (not trunc) semantics around zero
        pts = np.array([[-0.01, 0, 0], [0.01, 0, 0]], dtype=np.float32)
        c = pc.from_points(pts, capacity=4)
        filtered, nvox = voxel_downsample(c, 0.5, 4)
        assert int(nvox) == 2  # straddles the voxel boundary at 0

    def test_empty_cloud(self):
        c = pc.empty(16)
        filtered, nvox = voxel_downsample(c, 0.5, 8)
        assert int(nvox) == 0
        assert int(filtered.count()) == 0

    def test_overflow_reported(self):
        rng = np.random.RandomState(3)
        pts = rng.uniform(-50, 50, size=(100, 3)).astype(np.float32)
        c = pc.from_points(pts, capacity=128)
        filtered, nvox = voxel_downsample(c, 0.1, 16)  # ~100 voxels, cap 16
        assert int(nvox) > 16
        assert int(filtered.count()) == 16

    def test_single_voxel(self):
        pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2]], dtype=np.float32)
        c = pc.from_points(pts, capacity=4)
        filtered, nvox = voxel_downsample(c, 1.0, 4)
        assert int(nvox) == 1
        np.testing.assert_allclose(pc.to_numpy(filtered), [[0.15, 0.15, 0.15]], atol=1e-6)
