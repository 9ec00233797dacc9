"""OccupancyGrid tests (reference: tests/geometry/occupancygrid.cpp
behavior: DDA free-space marking, log-odds updates, extraction)."""
import numpy as np
import pytest

import cupoch_tpu as cph
from cupoch_tpu.geometry import OccupancyGrid


def _grid(res=64, voxel=0.1):
    return OccupancyGrid(voxel_size=voxel, resolution=res)


def test_defaults_match_reference():
    g = OccupancyGrid()
    assert g.voxel_size == pytest.approx(0.05)
    assert g.resolution == 512
    assert g.clamping_thres_min == pytest.approx(-2.0)
    assert g.clamping_thres_max == pytest.approx(3.5)
    assert g.prob_hit_log == pytest.approx(0.85)
    assert g.prob_miss_log == pytest.approx(-0.4)


def test_insert_marks_occupied_and_free():
    g = _grid()
    pts = np.asarray([[1.0, 0.0, 0.0]], np.float32)
    vp = np.zeros(3, np.float32)
    g.insert(pts, vp)
    assert g.is_occupied([1.0, 0.0, 0.0])
    # middle of the ray is free (observed, below threshold)
    assert not g.is_occupied([0.5, 0.0, 0.0])
    assert not g.is_unknown([0.5, 0.0, 0.0])
    # far away is unknown
    assert g.is_unknown([0.0, 2.0, 0.0])


def test_insert_log_odds_accumulates_and_clamps():
    g = _grid()
    pts = np.asarray([[1.0, 0.0, 0.0]], np.float32)
    vp = np.zeros(3, np.float32)
    for _ in range(10):
        g.insert(pts, vp)
    ok, v = g.get_voxel([1.0, 0.0, 0.0])
    assert ok and v.prob_log == pytest.approx(3.5)  # clamped at max
    ok, v = g.get_voxel([0.5, 0.0, 0.0])
    assert ok and v.prob_log == pytest.approx(-2.0)  # clamped at min


def test_max_range_clamps_hits():
    g = _grid()
    pts = np.asarray([[2.0, 0.0, 0.0]], np.float32)
    g.insert(pts, np.zeros(3, np.float32), max_range=1.0)
    # endpoint beyond range: no hit registered, space up to range free
    assert not g.is_occupied([2.0, 0.0, 0.0])
    assert g.is_unknown([2.0, 0.0, 0.0])
    assert not g.is_unknown([0.5, 0.0, 0.0])


def test_extract_voxels():
    g = _grid()
    pts = np.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    g.insert(pts, np.zeros(3, np.float32))
    occ_idx, occ_p, _ = g.extract_occupied_voxels()
    free_idx, free_p, _ = g.extract_free_voxels()
    known_idx, _, _ = g.extract_known_voxels()
    assert len(occ_idx) == 2
    assert (occ_p > 0).all()
    assert (free_p <= 0).all()
    assert len(known_idx) == len(occ_idx) + len(free_idx)


def test_add_voxels_and_set_free_area():
    g = _grid()
    half = g.resolution // 2
    g.add_voxel([half, half, half], occupied=True)
    assert g.is_occupied([0.05, 0.05, 0.05])
    g2 = _grid()
    g2.set_free_area([-0.2, -0.2, -0.2], [0.2, 0.2, 0.2])
    assert not g2.is_unknown([0.0, 0.0, 0.0])
    assert not g2.is_occupied([0.0, 0.0, 0.0])


def test_voxelgrid_roundtrip():
    from cupoch_tpu.geometry import VoxelGrid

    g = _grid()
    g.insert(np.asarray([[1.0, 0.0, 0.0]], np.float32), np.zeros(3, np.float32))
    vg = VoxelGrid.create_from_occupancy_grid(g)
    assert len(vg) == 1
    og = OccupancyGrid.create_from_voxel_grid(vg)
    assert og.is_occupied([1.0, 0.0, 0.0])


def test_insert_from_pointcloud_object():
    g = _grid()
    pcd = cph.geometry.PointCloud(
        np.asarray([[0.5, 0.5, 0.0]], np.float32))
    g.insert(pcd, np.zeros(3, np.float32))
    assert g.is_occupied([0.5, 0.5, 0.0])


def test_empty_insert_noop():
    g = _grid()
    g.insert(np.zeros((0, 3), np.float32), np.zeros(3, np.float32))
    assert g.is_empty()
