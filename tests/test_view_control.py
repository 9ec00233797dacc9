"""ViewControl camera math + trajectory playback rendering.

reference: view_control.cpp — extrinsic layout (right, -up, -front),
SetProjectionParameters distance/eye derivation, orbit/pan/zoom
semantics; view_trajectory.cpp interpolation consumed by playback."""
import os

import numpy as np
import pytest

from cupoch_tpu.visualization.render_option import ViewControl
from cupoch_tpu.visualization.view_trajectory import (
    ViewParameters, ViewTrajectory,
)


def _default_view():
    vc = ViewControl()
    vc.bounding_box_min = np.zeros(3)
    vc.bounding_box_max = np.ones(3)
    vc.change_window_size(640, 480)
    vc.reset()
    return vc


def test_projection_parameters_match_reference_formula():
    vc = _default_view()
    # distance = zoom * max_extent / tan(fov/2); eye = lookat + front*d
    d = 0.7 * 1.0 / np.tan(np.deg2rad(30.0))
    assert np.isclose(vc.distance, d)
    np.testing.assert_allclose(vc.eye, vc.lookat + vc.front * d)
    # orthonormal frame, right = up x front
    np.testing.assert_allclose(
        vc.right, np.cross(vc.up, vc.front), atol=1e-12)
    assert np.isclose(np.linalg.norm(vc.front), 1.0)


def test_extrinsic_layout_and_roundtrip():
    vc = _default_view()
    vc.rotate(120.0, -45.0)
    vc.scale(3.0)
    p = vc.convert_to_pinhole_camera_parameters()
    E = np.asarray(p.extrinsic)
    np.testing.assert_allclose(E[0, :3], vc.right, atol=1e-9)
    np.testing.assert_allclose(E[1, :3], -vc.up, atol=1e-9)
    np.testing.assert_allclose(E[2, :3], -vc.front, atol=1e-9)
    # the camera-frame eye maps to the origin
    cam = E[:3, :3] @ vc.eye + E[:3, 3]
    np.testing.assert_allclose(cam, 0.0, atol=1e-9)
    # intrinsic follows the reference formula
    K = np.asarray(p.intrinsic.intrinsic_matrix)
    assert np.isclose(K[1, 1], 480 / np.tan(np.deg2rad(
        vc.field_of_view / 2)) / 2.0, rtol=1e-5)
    assert np.isclose(K[0, 2], 640 / 2.0 - 0.5)

    vc2 = _default_view()
    assert vc2.convert_from_pinhole_camera_parameters(p)
    np.testing.assert_allclose(vc2.front, vc.front, atol=1e-6)
    np.testing.assert_allclose(vc2.up, vc.up, atol=1e-6)
    np.testing.assert_allclose(vc2.eye, vc.eye, atol=1e-5)
    assert np.isclose(vc2.zoom, vc.zoom, atol=1e-5)


def test_interactions():
    vc = _default_view()
    eye0 = vc.eye.copy()
    vc.rotate(200.0, 0.0)
    assert not np.allclose(vc.eye, eye0)
    assert np.isclose(np.linalg.norm(vc.eye - vc.lookat), vc.distance)
    lk0 = vc.lookat.copy()
    vc.translate(50.0, -30.0)
    assert not np.allclose(vc.lookat, lk0)
    z0 = vc.zoom
    vc.scale(2.0)
    assert np.isclose(vc.zoom, z0 + 2 * ViewControl.ZOOM_STEP)
    up0 = vc.up.copy()
    vc.roll(100.0)
    assert not np.allclose(vc.up, up0)
    # frame stays orthonormal through everything
    np.testing.assert_allclose(vc.front.dot(vc.up), 0.0, atol=1e-9)
    np.testing.assert_allclose(vc.front.dot(vc.right), 0.0, atol=1e-9)


def test_trajectory_playback_writes_frames(tmp_path, rng):
    mpl = pytest.importorskip("matplotlib")
    import jax.numpy as jnp

    from cupoch_tpu.geometry.pointcloud import PointCloud
    from cupoch_tpu.visualization.visualizer import draw_geometries

    pcd = PointCloud(jnp.asarray(
        rng.uniform(size=(500, 3)).astype(np.float32)))
    traj = ViewTrajectory()
    traj.interval = 1
    for frac in (0.0, 0.5, 1.0):
        s = ViewParameters()
        s.front = np.asarray([np.sin(frac), 0.2, np.cos(frac)])
        s.lookat = np.full(3, 0.5)
        s.boundingbox_max = np.ones(3)
        traj.view_status.append(s)
    pattern = str(tmp_path / "frame_%05d.png")
    assert draw_geometries([pcd], filename=pattern, trajectory=traj,
                           width=320, height=240)
    frames = sorted(os.listdir(tmp_path))
    assert len(frames) == traj.num_of_frames()
    assert all(f.endswith(".png") for f in frames)
