"""Graph / SSSP / DistanceTransform / collision / planner tests.

Model: reference tests/geometry/graph.cpp, distancetransform behavior,
collision + planning example flows (planner.cu:109-130).
"""
import numpy as np
import pytest

import cupoch_tpu as cph
from cupoch_tpu.collision import Box, Sphere, compute_intersection
from cupoch_tpu.geometry import (
    DistanceTransform,
    Graph,
    LineSet,
    OccupancyGrid,
    VoxelGrid,
)
from cupoch_tpu.planning import Pos3DPlanner


# -- LineSet -----------------------------------------------------------------

def test_lineset_basics():
    ls = LineSet([[0, 0, 0], [1, 0, 0], [1, 1, 0]], [[0, 1], [1, 2]])
    assert ls.has_lines() and ls.has_points()
    p0, p1 = ls.get_line_coordinate(1)
    np.testing.assert_allclose(p0, [1, 0, 0])
    np.testing.assert_allclose(p1, [1, 1, 0])
    ls.translate([1, 0, 0])
    np.testing.assert_allclose(ls.get_min_bound(), [1, 0, 0])
    path = LineSet.from_path([[0, 0, 0], [1, 0, 0], [2, 0, 0]])
    assert int(path.lines.shape[0]) == 2


# -- Graph / Dijkstra ----------------------------------------------------------

def _square_graph():
    # 0 - 1
    # |   |
    # 2 - 3     diagonal 0-3 heavy
    g = Graph(np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                         np.float32))
    g.add_edges([[0, 1], [0, 2], [1, 3], [2, 3]],
                [1.0, 1.0, 1.0, 1.0])
    g.add_edge([0, 3], 5.0)
    return g


def test_dijkstra_simple():
    g = _square_graph()
    path, dist = g.dijkstra_path(0, 3)
    assert dist == pytest.approx(2.0)
    assert path[0] == 0 and path[-1] == 3 and len(path) == 3


def test_dijkstra_all_nodes():
    g = _square_graph()
    res = g.dijkstra_paths(0)
    assert res[0].shortest_distance == pytest.approx(0.0)
    assert res[1].shortest_distance == pytest.approx(1.0)
    assert res[3].shortest_distance == pytest.approx(2.0)


def test_dijkstra_unreachable():
    g = Graph(np.asarray([[0, 0, 0], [1, 0, 0], [5, 5, 5]], np.float32))
    g.add_edge([0, 1], 1.0)
    path, dist = g.dijkstra_path(0, 2)
    assert path == [] and np.isinf(dist)


def test_edge_weights_from_distance_and_remove():
    g = Graph(np.asarray([[0, 0, 0], [3, 4, 0], [6, 8, 0]], np.float32))
    g.add_edges([[0, 1], [1, 2]])
    g.set_edge_weights_from_distance()
    _, dist = g.dijkstra_path(0, 2)
    assert dist == pytest.approx(10.0)
    g.remove_edge([1, 2])
    path, dist = g.dijkstra_path(0, 2)
    assert np.isinf(dist)


def test_graph_from_mesh_and_lattice():
    mesh = cph.geometry.TriangleMesh.create_box()
    g = Graph.create_from_triangle_mesh(mesh)
    assert int(g.points.shape[0]) == 8
    path, dist = g.dijkstra_path(0, 7)
    assert np.isfinite(dist)
    lat = Graph.create_from_axis_aligned_bounding_box(
        ([0, 0, 0], [1, 1, 1]), [3, 3, 3])
    assert int(lat.points.shape[0]) == 27
    path, dist = lat.dijkstra_path(0, 26)
    assert dist == pytest.approx(3.0)  # manhattan through lattice: 6 x 0.5


# -- DistanceTransform ---------------------------------------------------------

def test_distance_transform_from_voxelgrid():
    pcd = cph.geometry.PointCloud(np.asarray([[0.0, 0, 0]], np.float32))
    vg = VoxelGrid.create_from_point_cloud_within_bounds(
        pcd, 0.1, (-1.6, -1.6, -1.6), (1.6, 1.6, 1.6))
    dt = DistanceTransform(voxel_size=0.1, resolution=32)
    dt.compute_edt(vg)
    assert dt.get_distance([0.0, 0.0, 0.0]) == pytest.approx(0.0, abs=1e-5)
    d = dt.get_distance([1.0, 0.0, 0.0])
    assert d == pytest.approx(1.0, abs=0.15)


def test_distance_transform_voronoi():
    dt = DistanceTransform(voxel_size=1.0, resolution=16)
    dt.compute_voronoi_diagram(np.asarray([[2, 8, 8], [13, 8, 8]], np.int32))
    n = np.asarray(dt.nearest_index)
    np.testing.assert_array_equal(n[3, 8, 8], [2, 8, 8])
    np.testing.assert_array_equal(n[12, 8, 8], [13, 8, 8])


# -- collision -----------------------------------------------------------------

def test_voxel_voxel_collision():
    p1 = cph.geometry.PointCloud(np.asarray([[0.05, 0.05, 0.05]], np.float32))
    vg1 = VoxelGrid.create_from_point_cloud_within_bounds(
        p1, 0.1, (0, 0, 0), (1, 1, 1))
    vg2 = VoxelGrid.create_from_point_cloud_within_bounds(
        p1, 0.1, (0, 0, 0), (1, 1, 1))
    res = compute_intersection(vg1, vg2)
    assert res.is_collided()
    p3 = cph.geometry.PointCloud(np.asarray([[0.95, 0.95, 0.95]], np.float32))
    vg3 = VoxelGrid.create_from_point_cloud_within_bounds(
        p3, 0.1, (0, 0, 0), (1, 1, 1))
    assert not compute_intersection(vg1, vg3).is_collided()
    # margin bridges the gap
    assert compute_intersection(vg1, vg3, margin=2.0).is_collided()


def test_voxel_lineset_collision():
    p = cph.geometry.PointCloud(np.asarray([[0.5, 0.5, 0.5]], np.float32))
    vg = VoxelGrid.create_from_point_cloud(p, 0.2)
    through = LineSet([[0, 0.5, 0.5], [1, 0.5, 0.5]], [[0, 1]])
    res = compute_intersection(vg, through)
    assert res.is_collided()
    away = LineSet([[0, 5, 5], [1, 5, 5]], [[0, 1]])
    assert not compute_intersection(vg, away).is_collided()


def test_primitive_collision_and_voxelization():
    s = Sphere(0.5, center=(0.0, 0.0, 0.0))
    b = Box((1.0, 1.0, 1.0))
    res = compute_intersection([s], [b])
    assert res.is_collided()
    vgs = s.create_voxel_grid(0.1)
    assert len(vgs) > 100
    centers = np.asarray(vgs.get_voxel_centers())
    assert (np.linalg.norm(centers, axis=1) < 0.5 + 0.1).all()
    swept = s.create_voxel_grid_with_sweeping(
        0.2, np.asarray([[1, 0, 0, 2], [0, 1, 0, 0], [0, 0, 1, 0],
                         [0, 0, 0, 1]], np.float32), sampling=5)
    span = swept.get_max_bound() - swept.get_min_bound()
    assert span[0] > 2.5  # swept along x by 2 + diameter 1


def test_occupancy_collision():
    og = OccupancyGrid(voxel_size=0.1, resolution=64)
    og.insert(np.asarray([[1.0, 0, 0]], np.float32), np.zeros(3, np.float32))
    ls = LineSet([[1.0, -1.0, 0], [1.0, 1.0, 0]], [[0, 1]])
    res = compute_intersection(og, ls)
    assert res.is_collided()


# -- planner --------------------------------------------------------------------

def test_planner_avoids_obstacle():
    lat = Graph.create_from_axis_aligned_bounding_box(
        ([0, 0, 0], [2, 2, 2]), [9, 9, 9])
    planner = Pos3DPlanner(lat, object_radius=0.05, max_edge_distance=0.5)
    # wall at x=1 with a hole at the top corner
    wall_pts = []
    for y in np.linspace(0, 2, 21):
        for z in np.linspace(0, 1.6, 17):
            wall_pts.append([1.0, y, z])
    pc = cph.geometry.PointCloud(np.asarray(wall_pts, np.float32))
    vg = VoxelGrid.create_from_point_cloud(pc, 0.1)
    planner.add_obstacle(vg)
    planner.update_graph()
    path = planner.find_path([0.1, 1.0, 0.1], [1.9, 1.0, 0.1])
    assert len(path) > 2
    path = np.asarray(path)
    # the path must rise above the wall to pass
    crossing = path[np.argmin(np.abs(path[:, 0] - 1.0))]
    assert crossing[2] > 1.5
