"""Mesh collision primitive: containment, AABB, voxelization,
intersection overloads (reference: primitives.h:190 declares Mesh; the
TPU build implements it fully)."""
import numpy as np

from cupoch_tpu.collision import Box, Mesh, compute_intersection
from cupoch_tpu.geometry.trianglemesh_factory import create_box


def _box_mesh_primitive(lengths=(1.0, 1.0, 1.0), transform=None):
    m = create_box(*lengths)
    return Mesh.from_triangle_mesh(m, transform)


def test_mesh_contains_matches_box(rng):
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0.2, -0.1, 0.3]
    mesh_p = _box_mesh_primitive((1.0, 1.0, 1.0), T)
    box_p = Box((1.0, 1.0, 1.0), T)
    # Box is centered at the transform origin; create_box spans [0,1]^3
    pts = rng.uniform(-1.0, 2.0, size=(500, 3)).astype(np.float32)
    inside_mesh = mesh_p._contains(pts)
    lo = T[:3, 3]
    hi = T[:3, 3] + 1.0
    expect = ((pts >= lo + 1e-4) & (pts <= hi - 1e-4)).all(-1)
    clear = ((pts <= lo - 1e-4) | (pts >= hi + 1e-4)).any(-1)
    assert (inside_mesh[expect]).all()
    assert (~inside_mesh[clear]).all()
    assert box_p.type.name == "Box"


def test_mesh_aabb_and_voxel_grid():
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1.0, 2.0, 3.0]
    p = _box_mesh_primitive((0.5, 0.4, 0.3), T)
    lo, hi = p._aabb_bounds()
    np.testing.assert_allclose(lo, [1.0, 2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(hi, [1.5, 2.4, 3.3], atol=1e-6)
    vg = p.create_voxel_grid(0.1)
    assert len(vg) > 0
    centers = np.asarray(vg.get_voxel_centers())
    assert (centers >= lo - 0.1).all() and (centers <= hi + 0.1).all()


def test_mesh_primitive_intersects_voxelgrid():
    p = _box_mesh_primitive((1.0, 1.0, 1.0))
    vg = Box((1.0, 1.0, 1.0)).create_voxel_grid(0.25)
    res = compute_intersection([p], vg)
    assert res.is_collided()
    far = np.eye(4, dtype=np.float32)
    far[:3, 3] = [10, 10, 10]
    p2 = _box_mesh_primitive((1.0, 1.0, 1.0), far)
    res2 = compute_intersection([p2], vg)
    assert not res2.is_collided()


def test_mesh_sweeping_voxels():
    p = _box_mesh_primitive((0.4, 0.4, 0.4))
    dst = np.eye(4, dtype=np.float32)
    dst[:3, 3] = [1.0, 0.0, 0.0]
    swept = p.create_voxel_grid_with_sweeping(0.1, dst, sampling=5)
    centers = np.asarray(swept.get_voxel_centers())
    assert centers[:, 0].max() > 1.0  # reaches the destination pose
    assert centers[:, 0].min() < 0.3  # still covers the source pose
