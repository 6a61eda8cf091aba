"""Sharded-map equivalence with the single-device voxel map on the
8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icpslam_tpu import cloud as pc
from icpslam_tpu.mapping import voxel_map as vm
from icpslam_tpu.parallel import mesh as mesh_lib, sharded_map as sm


@pytest.fixture(scope="module")
def mesh8():
    return mesh_lib.make_mesh(8)


def make_cloud(seed, n=300, lo=-6, hi=6, capacity=512):
    rng = np.random.RandomState(seed)
    return pc.from_points(rng.uniform(lo, hi, (n, 3)).astype(np.float32), capacity=capacity)


class TestShardedMap:
    def test_insert_size_matches_single_device(self, mesh8):
        res = 0.4
        cloud = make_cloud(0)
        single = vm.insert(vm.empty_map(4096), cloud, res)
        smap = sm.empty_sharded_map(1024, 8)
        smap = sm.insert(smap, cloud, res, mesh8)
        assert int(sm.total_size(smap)) == int(single.size)

    def test_dedup_across_inserts(self, mesh8):
        res = 0.4
        cloud = make_cloud(1)
        smap = sm.empty_sharded_map(1024, 8)
        smap = sm.insert(smap, cloud, res, mesh8)
        size1 = int(sm.total_size(smap))
        smap = sm.insert(smap, cloud, res, mesh8)  # same cloud again
        assert int(sm.total_size(smap)) == size1

    def test_owner_disjoint_and_complete(self):
        coords = jnp.asarray(
            np.random.RandomState(2).randint(-100, 100, (500, 3)), jnp.int32
        )
        own = np.asarray(sm.owner_of(coords, 8))
        assert own.min() >= 0 and own.max() < 8
        # block-coherent: same block → same owner
        c0 = jnp.asarray([[5, 5, 5], [6, 6, 6]], jnp.int32)  # same 16-block
        o = np.asarray(sm.owner_of(c0, 8))
        assert o[0] == o[1]

    def test_nn_matches_single_device(self, mesh8):
        res = 0.4
        cloud = make_cloud(3)
        single = vm.insert(vm.empty_map(4096), cloud, res)
        smap = sm.insert(sm.empty_sharded_map(1024, 8), cloud, res, mesh8)

        rng = np.random.RandomState(4)
        q = jnp.asarray(rng.uniform(-5, 5, (64, 3)), jnp.float32)
        qm = jnp.ones(64, bool)
        ref = vm.approx_nn(single, q, qm, res)
        got = sm.approx_nn(smap, q, qm, res, mesh8)
        np.testing.assert_array_equal(np.asarray(got.found), np.asarray(ref.found))
        np.testing.assert_allclose(
            np.asarray(got.dist2)[np.asarray(ref.found)],
            np.asarray(ref.dist2)[np.asarray(ref.found)],
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got.points)[np.asarray(ref.found)],
            np.asarray(ref.points)[np.asarray(ref.found)],
            atol=1e-5,
        )

    def test_jit_insert_and_query(self, mesh8):
        res = 0.4
        cloud = make_cloud(5)
        ins = jax.jit(
            lambda m, c: sm.insert(m, c, res, mesh8), static_argnums=()
        )
        smap = ins(sm.empty_sharded_map(1024, 8), cloud)
        assert int(sm.total_size(smap)) > 0
        nn = jax.jit(lambda m, q: sm.approx_nn(m, q, jnp.ones(q.shape[0], bool), res, mesh8))(
            smap, cloud.points[:64]
        )
        # map points queried against themselves → zero distance
        valid = np.asarray(cloud.mask[:64])
        assert np.all(np.asarray(nn.dist2)[valid] < 1e-6)
