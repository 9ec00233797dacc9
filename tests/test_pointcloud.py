import numpy as np
import pytest

import jax.numpy as jnp

from cupoch_tpu.geometry import PointCloud, AxisAlignedBoundingBox, OrientedBoundingBox
from cupoch_tpu.knn import KDTreeSearchParamKNN, KDTreeSearchParamHybrid


def make_cloud(rng, n=200):
    return PointCloud(rng.uniform(size=(n, 3)).astype(np.float32))


def test_ctor_and_predicates(rng):
    pcd = make_cloud(rng)
    assert pcd.has_points() and not pcd.has_normals() and not pcd.has_colors()
    assert len(pcd) == 200
    pcd.paint_uniform_color([1.0, 0.0, 0.0])
    assert pcd.has_colors()
    np.testing.assert_allclose(np.asarray(pcd.colors)[0], [1, 0, 0])


def test_transform_roundtrip(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    pcd = PointCloud(pts)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1, 2, 3]
    pcd.transform(T)
    np.testing.assert_allclose(np.asarray(pcd.points), pts + [1, 2, 3], atol=1e-6)
    pcd.translate([-1, -2, -3])
    np.testing.assert_allclose(np.asarray(pcd.points), pts, atol=1e-6)


def test_scale_rotate(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    pcd = PointCloud(pts)
    c = pts.mean(0)
    pcd.scale(2.0, center=True)
    np.testing.assert_allclose(np.asarray(pcd.points), (pts - c) * 2 + c, atol=1e-5)


def test_bounds(rng):
    pts = rng.uniform(size=(100, 3)).astype(np.float32)
    pcd = PointCloud(pts)
    np.testing.assert_allclose(pcd.get_min_bound(), pts.min(0), atol=1e-6)
    np.testing.assert_allclose(pcd.get_max_bound(), pts.max(0), atol=1e-6)
    np.testing.assert_allclose(pcd.get_center(), pts.mean(0), atol=1e-5)


def test_select_by_index(rng):
    pcd = make_cloud(rng, 100)
    sel = pcd.select_by_index([0, 5, 10])
    assert len(sel) == 3
    inv = pcd.select_by_index([0, 5, 10], invert=True)
    assert len(inv) == 97


def test_voxel_down_sample_grid():
    # 8 points in distinct voxels + 2 coincident-cell points
    pts = np.array(
        [[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
         [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1],
         [0.01, 0.01, 0.01], [0.02, 0, 0]],
        np.float32,
    )
    pcd = PointCloud(pts)
    out = pcd.voxel_down_sample(0.5)
    # the three near-origin points share one voxel -> 8 voxels total
    assert len(out) == 8
    got = np.asarray(out.points)
    near_origin = got[np.linalg.norm(got, axis=1) < 0.1]
    np.testing.assert_allclose(near_origin[0], pts[[0, 8, 9]].mean(0), atol=1e-6)


def test_voxel_down_sample_averages_colors(rng):
    pts = np.zeros((4, 3), np.float32)
    pcd = PointCloud(pts)
    pcd.colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], np.float32)
    out = pcd.voxel_down_sample(1.0)
    assert len(out) == 1
    np.testing.assert_allclose(np.asarray(out.colors)[0], [0.5, 0.5, 0.5], atol=1e-6)


def test_uniform_down_sample(rng):
    pcd = make_cloud(rng, 100)
    out = pcd.uniform_down_sample(10)
    assert len(out) == 10
    np.testing.assert_allclose(np.asarray(out.points)[1], np.asarray(pcd.points)[10])


def test_farthest_point_down_sample(rng):
    pcd = make_cloud(rng, 128)
    out = pcd.farthest_point_down_sample(16)
    assert len(out) == 16
    # sampled points are distinct
    assert len(np.unique(np.asarray(out.points), axis=0)) == 16


def test_estimate_normals_plane(rng):
    # points on z=0 plane -> normals +-z
    xy = rng.uniform(size=(300, 2)).astype(np.float32)
    pts = np.concatenate([xy, np.zeros((300, 1), np.float32)], 1)
    pcd = PointCloud(pts)
    pcd.estimate_normals(KDTreeSearchParamKNN(10))
    n = np.asarray(pcd.normals)
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
    pcd.orient_normals_to_align_with_direction([0, 0, 1])
    n = np.asarray(pcd.normals)
    np.testing.assert_allclose(n[:, 2], 1.0, atol=1e-3)


def test_estimate_normals_sphere(rng):
    # points on unit sphere -> normal ~ +-position
    v = rng.normal(size=(1000, 3)).astype(np.float32)
    pts = v / np.linalg.norm(v, axis=1, keepdims=True)
    pcd = PointCloud(pts)
    pcd.estimate_normals(KDTreeSearchParamKNN(20))
    pcd.orient_normals_towards_camera_location([0.0, 0.0, 0.0])
    n = np.asarray(pcd.normals)
    cos = np.abs((n * pts).sum(1))
    assert np.median(cos) > 0.98


def test_remove_radius_outliers(rng):
    cluster = rng.uniform(size=(100, 3)).astype(np.float32) * 0.2
    outlier = np.array([[10.0, 10, 10]], np.float32)
    pcd = PointCloud(np.concatenate([cluster, outlier]))
    res, idx = pcd.remove_radius_outliers(nb_points=5, search_radius=0.3)
    assert len(res) == 100
    assert 100 not in idx


def test_remove_statistical_outliers(rng):
    cluster = rng.normal(size=(200, 3)).astype(np.float32) * 0.1
    outlier = np.array([[5.0, 5, 5]], np.float32)
    pcd = PointCloud(np.concatenate([cluster, outlier]))
    res, idx = pcd.remove_statistical_outliers(nb_neighbors=10, std_ratio=2.0)
    assert 200 not in idx
    assert len(res) >= 150


def test_pass_through_filter(rng):
    pcd = make_cloud(rng, 100)
    out = pcd.pass_through_filter(2, 0.25, 0.75)
    z = np.asarray(out.points)[:, 2]
    assert np.all((z >= 0.25) & (z <= 0.75))


def test_crop_aabb(rng):
    pcd = make_cloud(rng, 500)
    box = AxisAlignedBoundingBox([0.2, 0.2, 0.2], [0.8, 0.8, 0.8])
    out = pcd.crop(box)
    p = np.asarray(out.points)
    assert np.all((p >= 0.2 - 1e-6) & (p <= 0.8 + 1e-6))


def test_segment_plane(rng):
    plane_pts = np.concatenate(
        [rng.uniform(size=(400, 2)).astype(np.float32),
         np.zeros((400, 1), np.float32)], 1)
    noise = rng.uniform(size=(50, 3)).astype(np.float32) + [0, 0, 0.5]
    pcd = PointCloud(np.concatenate([plane_pts, noise]))
    plane, inliers = pcd.segment_plane(0.01, num_iterations=64)
    assert len(inliers) >= 390
    # plane normal ~ +-z
    assert abs(plane[2]) > 0.99


def test_cluster_dbscan(rng):
    c1 = rng.normal(size=(100, 3)).astype(np.float32) * 0.05
    c2 = rng.normal(size=(100, 3)).astype(np.float32) * 0.05 + 5.0
    iso = np.array([[10.0, -10, 10]], np.float32)
    pcd = PointCloud(np.concatenate([c1, c2, iso]))
    labels = pcd.cluster_dbscan(eps=0.3, min_points=5)
    assert labels[200] == -1
    assert len(set(labels[:100])) == 1
    assert len(set(labels[100:200])) == 1
    assert labels[0] != labels[150]


def test_obb_from_points(rng):
    # elongated box along rotated axis
    pts = rng.uniform(size=(500, 3)).astype(np.float32) - 0.5
    pts[:, 0] *= 10.0
    from scipy.spatial.transform import Rotation
    R = Rotation.from_euler("z", 0.7).as_matrix().astype(np.float32)
    ptsr = pts @ R.T
    obb = OrientedBoundingBox.create_from_points(ptsr)
    ext = np.sort(np.asarray(obb.extent))
    assert ext[-1] > 8.0 and ext[-2] < 2.0
    obb.scale(1.0 + 1e-5)  # boundary points sit exactly on faces in f32
    assert np.all(np.asarray(obb.contains_mask(ptsr)))


def test_add_clouds(rng):
    a = make_cloud(rng, 10)
    b = make_cloud(rng, 20)
    c = a + b
    assert len(c) == 30


def test_gaussian_filter_smooths(rng):
    pts = np.concatenate(
        [rng.uniform(size=(200, 2)).astype(np.float32),
         rng.normal(size=(200, 1)).astype(np.float32) * 0.01], 1)
    pcd = PointCloud(pts)
    out = pcd.gaussian_filter(0.2, 0.01)
    assert np.asarray(out.points)[:, 2].std() < pts[:, 2].std()
