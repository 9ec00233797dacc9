"""Bucket broad phase vs dense all-pairs parity (collision.py).

reference: the LBVH broad phase, collision.cu:21-22 — the TPU design
replaces the BVH walk with a 27-run uniform bucket grid; results must
match the dense path exactly on workloads both can run."""
import numpy as np
import jax.numpy as jnp

from cupoch_tpu.collision import collision
from cupoch_tpu.collision.collision import (
    _aabb_overlap_pairs, _bucket_overlap_pairs, _pairs_from_matrix,
)
from cupoch_tpu.geometry.voxelgrid import VoxelGrid


def _boxes(rng, n, size, spread):
    lo = (rng.uniform(size=(n, 3)) * spread).astype(np.float32)
    return lo, lo + np.float32(size)


def _canon(pairs):
    if len(pairs) == 0:
        return set()
    return set(map(tuple, np.asarray(pairs).tolist()))


def test_bucket_matches_dense(rng):
    lo1, hi1 = _boxes(rng, 400, 0.05, 1.0)
    lo2, hi2 = _boxes(rng, 500, 0.05, 1.0)
    dense = _pairs_from_matrix(_aabb_overlap_pairs(
        jnp.asarray(lo1), jnp.asarray(hi1), jnp.asarray(lo2),
        jnp.asarray(hi2), 0.0))
    got = _bucket_overlap_pairs(lo1, hi1, lo2, hi2, 0.0)
    assert got is not None
    pairs, dropped = got
    assert dropped == 0
    assert _canon(pairs) == _canon(dense)


def test_bucket_with_margin(rng):
    lo1, hi1 = _boxes(rng, 300, 0.04, 1.0)
    lo2, hi2 = _boxes(rng, 300, 0.04, 1.0)
    m = 0.03
    dense = _pairs_from_matrix(_aabb_overlap_pairs(
        jnp.asarray(lo1), jnp.asarray(hi1), jnp.asarray(lo2),
        jnp.asarray(hi2), m))
    pairs, dropped = _bucket_overlap_pairs(lo1, hi1, lo2, hi2, m)
    assert dropped == 0
    assert _canon(pairs) == _canon(dense)


def test_voxelgrid_bucket_route(rng):
    # two shifted voxel grids big enough to trigger the bucket path
    n_side = 18
    g = np.stack(np.meshgrid(*([np.arange(n_side)] * 3),
                             indexing="ij"), -1).reshape(-1, 3)
    vg1 = VoxelGrid()
    vg1.voxel_size = 0.1
    vg1.origin = np.zeros(3, np.float32)
    vg1.voxels_keys = jnp.asarray(g.astype(np.int32))
    vg1.voxels_values = jnp.zeros((len(g), 3), jnp.float32)
    vg2 = VoxelGrid()
    vg2.voxel_size = 0.1
    vg2.origin = np.float32([0.05, 0.05, 0.05])
    vg2.voxels_keys = jnp.asarray(g.astype(np.int32))
    vg2.voxels_values = jnp.zeros((len(g), 3), jnp.float32)
    n = len(g)
    assert n * n > collision._DENSE_LIMIT
    res = collision.compute_intersection(vg1, vg2, 0.0)
    assert res.is_collided()
    # every interior voxel of grid 1 overlaps 8 shifted voxels
    assert len(res.collision_index_pairs) >= (n_side - 1) ** 3 * 8
    assert res.n_dropped == 0
