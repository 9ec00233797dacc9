"""VoxelGrid + intersection-test unit tests.

Model: reference tests/geometry/voxelgrid.cpp and the analytic-case
pattern of SURVEY.md section 4.
"""
import numpy as np
import pytest

import cupoch_tpu as cph
from cupoch_tpu.geometry import VoxelGrid, intersection_test as it

import jax.numpy as jnp


# -- intersection primitives -------------------------------------------------

def test_triangle_aabb_basic():
    c = jnp.zeros(3)
    h = jnp.full(3, 0.5)
    # triangle through the box
    hit = it.triangle_aabb(c, h, jnp.asarray([-1.0, 0, 0]),
                           jnp.asarray([1.0, 0, 0]), jnp.asarray([0, 1.0, 0]))
    assert bool(hit)
    # triangle far away
    miss = it.triangle_aabb(c, h, jnp.asarray([5.0, 5, 5]),
                            jnp.asarray([6.0, 5, 5]), jnp.asarray([5, 6.0, 5]))
    assert not bool(miss)
    # triangle plane parallel, outside the box
    miss2 = it.triangle_aabb(c, h, jnp.asarray([-1.0, 0, 2.0]),
                             jnp.asarray([1.0, 0, 2.0]),
                             jnp.asarray([0, 1.0, 2.0]))
    assert not bool(miss2)


def test_tri_tri():
    # crossing triangles
    hit = it.tri_tri(jnp.asarray([0.0, 0, -1]), jnp.asarray([0.0, 0, 1]),
                     jnp.asarray([0.0, 2, 0]),
                     jnp.asarray([-1.0, 0.5, 0]), jnp.asarray([1.0, 0.5, 0]),
                     jnp.asarray([0.0, 0.5, 2]))
    assert bool(hit)
    miss = it.tri_tri(jnp.asarray([0.0, 0, 0]), jnp.asarray([1.0, 0, 0]),
                      jnp.asarray([0.0, 1, 0]),
                      jnp.asarray([0.0, 0, 5]), jnp.asarray([1.0, 0, 5]),
                      jnp.asarray([0.0, 1, 5]))
    assert not bool(miss)


def test_point_triangle_dist2():
    a = jnp.asarray([0.0, 0, 0])
    b = jnp.asarray([1.0, 0, 0])
    c = jnp.asarray([0.0, 1, 0])
    # above the interior
    d2 = it.point_triangle_dist2(jnp.asarray([0.2, 0.2, 0.5]), a, b, c)
    np.testing.assert_allclose(float(d2), 0.25, atol=1e-6)
    # nearest to vertex a
    d2 = it.point_triangle_dist2(jnp.asarray([-1.0, -1.0, 0.0]), a, b, c)
    np.testing.assert_allclose(float(d2), 2.0, atol=1e-6)
    # nearest to edge ab
    d2 = it.point_triangle_dist2(jnp.asarray([0.5, -1.0, 0.0]), a, b, c)
    np.testing.assert_allclose(float(d2), 1.0, atol=1e-6)


# -- VoxelGrid ---------------------------------------------------------------

def test_create_from_point_cloud():
    pts = np.asarray([[0.0, 0, 0], [0.001, 0, 0], [1.0, 1, 1]], np.float32)
    pcd = cph.geometry.PointCloud(pts)
    vg = VoxelGrid.create_from_point_cloud(pcd, 0.1)
    assert len(vg) == 2
    inc = vg.check_if_included(pts)
    assert inc.all()
    assert not vg.check_if_included(np.asarray([[5.0, 5, 5]])).any()


def test_create_from_point_cloud_colors_average():
    pts = np.zeros((2, 3), np.float32)
    pcd = cph.geometry.PointCloud(pts)
    pcd.colors = np.asarray([[1.0, 0, 0], [0.0, 1, 0]], np.float32)
    vg = VoxelGrid.create_from_point_cloud(pcd, 0.1)
    assert len(vg) == 1
    np.testing.assert_allclose(
        np.asarray(vg.voxels_colors)[0], [0.5, 0.5, 0.0], atol=1e-6)


def test_voxel_size_zero_raises():
    pcd = cph.geometry.PointCloud(np.zeros((1, 3), np.float32))
    with pytest.raises(RuntimeError):
        VoxelGrid.create_from_point_cloud(pcd, 0.0)


def test_create_dense_and_bounds():
    vg = VoxelGrid.create_dense((0.0, 0, 0), 0.5, 2.0, 1.0, 1.5)
    assert len(vg) == 4 * 2 * 3
    np.testing.assert_allclose(vg.get_min_bound(), [0, 0, 0])
    np.testing.assert_allclose(vg.get_max_bound(), [2.0, 1.0, 1.5])


def test_create_from_triangle_mesh():
    mesh = cph.geometry.TriangleMesh.create_box()  # unit box
    vg = VoxelGrid.create_from_triangle_mesh(mesh, 0.5)
    # surface voxelization of a unit cube at 0.5: every boundary cell of
    # a 3x3x3 block (interior empty) = 26, but geometry puts faces on
    # cell borders; just require a plausible shell
    assert len(vg) >= 8
    keys = np.asarray(vg.voxels_keys)
    assert keys.min() >= 0


def test_merge_and_select():
    p1 = cph.geometry.PointCloud(np.asarray([[0.05, 0.05, 0.05]], np.float32))
    vg1 = VoxelGrid.create_from_point_cloud_within_bounds(
        p1, 0.1, (0, 0, 0), (1, 1, 1))
    p2 = cph.geometry.PointCloud(np.asarray([[0.95, 0.95, 0.95]], np.float32))
    vg2 = VoxelGrid.create_from_point_cloud_within_bounds(
        p2, 0.1, (0, 0, 0), (1, 1, 1))
    merged = vg1 + vg2
    assert len(merged) == 2
    sel = merged.select_by_index([0])
    assert len(sel) == 1
    sel_inv = merged.select_by_index([0], invert=True)
    assert len(sel_inv) == 1


def test_get_voxel_roundtrip():
    vg = VoxelGrid()
    vg.voxel_size = 0.25
    vg.origin = np.asarray([1.0, 2.0, 3.0], np.float32)
    idx = vg.get_voxel([1.3, 2.6, 3.9])
    np.testing.assert_array_equal(idx, [1, 2, 3])
    center = vg.get_voxel_center_coordinate(idx)
    np.testing.assert_allclose(center, [1.375, 2.625, 3.875])


def test_carve_silhouette():
    import cupoch_tpu.camera as camera

    vg = VoxelGrid.create_dense((-0.5, -0.5, 1.0), 0.25, 1.0, 1.0, 1.0)
    n0 = len(vg)
    intr = camera.PinholeCameraIntrinsic(64, 64, 64.0, 64.0, 32.0, 32.0)
    params = camera.PinholeCameraParameters()
    params.intrinsic = intr
    params.extrinsic = np.eye(4, dtype=np.float32)
    # mask: only the left half of the image is "inside"
    mask = np.zeros((64, 64, 1), np.float32)
    mask[:, :32] = 1.0
    img = cph.geometry.Image(mask)
    vg.carve_silhouette(img, params)
    assert 0 < len(vg) < n0
