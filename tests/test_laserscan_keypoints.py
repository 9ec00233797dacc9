"""Tests for LaserScanBuffer, Map2D, ISS keypoints, PointCloud factories
(reference test model: src/tests/geometry/laserscanbuffer.cpp etc.)."""
import math

import numpy as np
import pytest

from cupoch_tpu.camera import PinholeCameraIntrinsic
from cupoch_tpu.geometry import (
    Image,
    LaserScanBuffer,
    Map2D,
    PointCloud,
    compute_iss_keypoints,
)


# ---------------------------------------------------------------------------
# LaserScanBuffer
# ---------------------------------------------------------------------------

def test_ring_buffer_semantics():
    buf = LaserScanBuffer(num_steps=10, num_max_scans=3)
    assert buf.is_empty() and not buf.is_full()
    for i in range(3):
        buf.add_ranges(np.full(10, float(i + 1), np.float32))
    assert buf.is_full() and buf.get_num_scans() == 3
    # overflow evicts the oldest
    buf.add_ranges(np.full(10, 4.0, np.float32))
    assert buf.get_num_scans() == 3
    r = buf.get_ranges()
    np.testing.assert_allclose(r[:, 0], [2.0, 3.0, 4.0])


def test_pop_one_scan():
    buf = LaserScanBuffer(num_steps=5, num_max_scans=4)
    buf.add_ranges(np.arange(5, dtype=np.float32))
    buf.add_ranges(np.arange(5, 10, dtype=np.float32))
    scan = buf.pop_one_scan()
    np.testing.assert_allclose(scan.get_ranges()[0], np.arange(5))
    assert buf.get_num_scans() == 1
    ranges, _ = buf.pop_host_one_scan()
    np.testing.assert_allclose(ranges, np.arange(5, 10))
    assert buf.is_empty()


def test_range_filter():
    buf = LaserScanBuffer(num_steps=4, num_max_scans=2)
    buf.add_ranges(np.asarray([0.5, 1.0, 5.0, 2.0], np.float32))
    out = buf.range_filter(0.8, 3.0)
    r = out.get_ranges()[0]
    assert np.isnan(r[0]) and np.isnan(r[2])
    np.testing.assert_allclose(r[[1, 3]], [1.0, 2.0])


def test_scan_shadows_filter_removes_veiling_points():
    # straight wall at 2m, one outlier "veiling" reading much closer
    num_steps = 91
    buf = LaserScanBuffer(num_steps=num_steps, num_max_scans=1,
                          min_angle=-math.pi / 4, max_angle=math.pi / 4)
    ranges = np.full(num_steps, 2.0, np.float32)
    ranges[45] = 0.3
    buf.add_ranges(ranges)
    out = buf.scan_shadows_filter(min_angle=10.0, max_angle=170.0, window=1,
                                  neighbors=0,
                                  remove_shadow_start_point=True)
    r = out.get_ranges()[0]
    assert np.isnan(r[45])
    assert np.isfinite(r[:40]).all()


def test_scan_to_pointcloud_projection():
    num_steps = 4
    buf = LaserScanBuffer(num_steps=num_steps, num_max_scans=1,
                          min_angle=0.0, max_angle=math.pi / 2)
    buf.add_ranges(np.full(num_steps, 1.0, np.float32))
    pcd = PointCloud.create_from_laserscanbuffer(buf, 0.1, 10.0)
    pts = np.asarray(pcd.points)
    assert pts.shape == (4, 3)
    np.testing.assert_allclose(pts[0], [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(pts[-1], [0.0, 1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-6)


def test_scan_transform_moves_origin():
    buf = LaserScanBuffer(num_steps=2, num_max_scans=1,
                          min_angle=0.0, max_angle=math.pi)
    buf.add_ranges(np.asarray([1.0, 1.0], np.float32))
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0, 0, 5]
    buf.transform(T)
    pcd = PointCloud.create_from_laserscanbuffer(buf, 0.1, 10.0)
    np.testing.assert_allclose(np.asarray(pcd.points)[:, 2], 5.0, atol=1e-6)


def test_create_from_pointcloud_roundtrip():
    # ring of points at range 2 in the z=0.5 slice
    ang = np.linspace(-math.pi, math.pi, 64, endpoint=False)
    pts = np.stack([2.0 * np.cos(ang), 2.0 * np.sin(ang),
                    np.full(64, 0.5)], -1).astype(np.float32)
    buf = LaserScanBuffer.create_from_point_cloud(
        PointCloud(pts), angle_increment=2 * math.pi / 128,
        min_height=0.0, max_height=1.0)
    assert buf is not None and buf.get_num_scans() == 1
    r = buf.get_ranges()[0]
    finite = np.isfinite(r)
    assert finite.sum() >= 60
    np.testing.assert_allclose(r[finite], 2.0, atol=1e-5)


def test_merge():
    a = LaserScanBuffer(num_steps=3, num_max_scans=4)
    b = LaserScanBuffer(num_steps=3, num_max_scans=4)
    a.add_ranges(np.ones(3, np.float32))
    b.add_ranges(np.full(3, 2.0, np.float32))
    a.merge(b)
    assert a.get_num_scans() == 2
    np.testing.assert_allclose(a.get_ranges()[1], 2.0)


# ---------------------------------------------------------------------------
# Map2D
# ---------------------------------------------------------------------------

def test_map2d_basics():
    img = Image(np.zeros((10, 20, 1), np.uint8))
    m = Map2D(img, cell_size=0.1)
    assert not m.is_empty()
    np.testing.assert_allclose(m.get_center(), [10.0, 5.0])
    m.translate([1.0, 2.0])
    np.testing.assert_allclose(m.origin, [1.0, 2.0])
    m.scale(2.0)
    assert m.cell_size == pytest.approx(0.2)
    m.clear()
    assert m.is_empty()


# ---------------------------------------------------------------------------
# ISS keypoints
# ---------------------------------------------------------------------------

def test_iss_keypoints_on_plane_boundary():
    # flat plane: interior points fail the λ2/λ1 ratio test (isotropic
    # in-plane spread), only boundary/corner neighborhoods are
    # anisotropic enough to fire
    g = 20
    xx, yy = np.meshgrid(np.linspace(0, 1, g), np.linspace(0, 1, g))
    plane = np.stack([xx.ravel(), yy.ravel(),
                      np.zeros(g * g)], -1).astype(np.float32)
    pcd = PointCloud(plane)
    kp, mask = compute_iss_keypoints(pcd, salient_radius=0.15,
                                     non_max_radius=0.1)
    assert mask.shape[0] == len(pcd)
    assert len(kp) >= 1
    # every keypoint sits near the plane boundary
    pts = np.asarray(kp.points)
    border = np.minimum.reduce([pts[:, 0], 1 - pts[:, 0],
                                pts[:, 1], 1 - pts[:, 1]])
    assert (border < 0.2).all()


def test_iss_empty():
    kp, mask = compute_iss_keypoints(PointCloud())
    assert len(kp) == 0 and mask.shape[0] == 0


def test_iss_auto_radius(rng):
    pts = rng.uniform(size=(300, 3)).astype(np.float32)
    kp, mask = compute_iss_keypoints(PointCloud(pts))
    assert mask.shape[0] == 300  # runs with derived radii


# ---------------------------------------------------------------------------
# PointCloud factories
# ---------------------------------------------------------------------------

def _intrinsic():
    return PinholeCameraIntrinsic(64, 48, 50.0, 50.0, 31.5, 23.5)


def test_create_from_depth_image():
    depth = np.full((48, 64), 2000, np.uint16)  # 2 m everywhere
    pcd = PointCloud.create_from_depth_image(Image(depth[..., None]),
                                             _intrinsic())
    pts = np.asarray(pcd.points)
    assert pts.shape == (48 * 64, 3)
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-6)
    # center pixel maps to the optical axis
    center = pts[23 * 64 + 31]
    np.testing.assert_allclose(center[:2], [-0.02, -0.02], atol=0.021)


def test_create_from_rgbd_image():
    from cupoch_tpu.geometry import RGBDImage

    depth = np.full((48, 64), 1.0, np.float32)
    color = np.full((48, 64, 3), 128, np.uint8)
    rgbd = RGBDImage(Image(color.astype(np.float32) / 255.0),
                     Image(depth[..., None]))
    pcd = PointCloud.create_from_rgbd_image(rgbd, _intrinsic(),
                                            compute_normals=True)
    assert len(pcd) == 48 * 64
    assert pcd.has_colors() and pcd.has_normals()
    np.testing.assert_allclose(np.asarray(pcd.colors)[0], 128 / 255.0,
                               atol=1e-5)
    # flat depth -> normals along -z or +z
    nz = np.abs(np.asarray(pcd.normals)[:, 2])
    assert (nz > 0.99).mean() > 0.9


def test_create_from_disparity():
    disp = np.full((48, 64), 10, np.uint8)
    color = np.full((48, 64, 3), 255, np.uint8)
    left = _intrinsic()
    right = _intrinsic()
    pcd = PointCloud.create_from_disparity(Image(disp[..., None]),
                                           Image(color), left, right,
                                           baseline=0.1)
    pts = np.asarray(pcd.points)
    assert len(pts) == 48 * 64
    # z = fx * baseline / disparity = 50 * 0.1 / 10 = 0.5
    np.testing.assert_allclose(pts[:, 2], 0.5, atol=1e-5)


def test_create_from_occupancygrid():
    from cupoch_tpu.geometry import OccupancyGrid

    grid = OccupancyGrid(voxel_size=0.5, resolution=32)
    pts = np.asarray([[1.0, 1.0, 1.0]], np.float32)
    grid.insert(pts, np.zeros(3, np.float32))
    pcd = PointCloud.create_from_occupancygrid(grid)
    assert len(pcd) >= 1
    d = np.linalg.norm(np.asarray(pcd.points) - pts, axis=1)
    assert d.min() < 0.5
