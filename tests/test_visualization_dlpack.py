"""Visualization bridge, colormaps, and DLPack interop tests."""
import os

import numpy as np
import pytest

import cupoch_tpu  # installs dlpack methods
from cupoch_tpu.geometry import LineSet, PointCloud
from cupoch_tpu.visualization import (
    ColorMapOption,
    RenderOption,
    ViewControl,
    ViewTrajectory,
    Visualizer,
    draw_geometries,
    get_color_map_color,
    set_global_color_map_option,
)


# -- colormaps ------------------------------------------------------------

def test_colormap_endpoints():
    for opt, lo, hi in [
        (ColorMapOption.Gray, [0, 0, 0], [1, 1, 1]),
        (ColorMapOption.Jet, [0, 0, 0.5], [0.5, 0, 0]),
        (ColorMapOption.Hot, [1, 1, 1], [0, 0, 0]),
        (ColorMapOption.Summer, [0, 0.5, 0.4], [1, 1, 0.4]),
        (ColorMapOption.Winter, [0, 0, 1], [0, 1, 0.5]),
    ]:
        c0 = np.asarray(get_color_map_color(0.0, opt))
        c1 = np.asarray(get_color_map_color(1.0, opt))
        np.testing.assert_allclose(c0, lo, atol=1e-6, err_msg=str(opt))
        np.testing.assert_allclose(c1, hi, atol=1e-6, err_msg=str(opt))


def test_colormap_vectorised_and_global():
    vals = np.linspace(0, 1, 100).astype(np.float32)
    c = np.asarray(get_color_map_color(vals, ColorMapOption.Jet))
    assert c.shape == (100, 3)
    assert (c >= 0).all() and (c <= 1).all()
    set_global_color_map_option(ColorMapOption.Hot)
    c2 = np.asarray(get_color_map_color(vals))
    np.testing.assert_allclose(
        c2, np.asarray(get_color_map_color(vals, ColorMapOption.Hot)))
    set_global_color_map_option(ColorMapOption.Jet)


# -- render option / view JSON roundtrip ---------------------------------

def test_render_option_json_roundtrip(tmp_path):
    from cupoch_tpu.io import (
        read_ijson_convertible_from_json,
        write_ijson_convertible_to_json,
    )

    opt = RenderOption()
    opt.point_size = 9.0
    opt.background_color = np.asarray([0.1, 0.2, 0.3], np.float32)
    path = str(tmp_path / "render.json")
    assert write_ijson_convertible_to_json(path, opt)
    back = read_ijson_convertible_from_json(path, RenderOption)
    assert back.point_size == 9.0
    np.testing.assert_allclose(back.background_color, [0.1, 0.2, 0.3],
                               atol=1e-6)


def test_view_trajectory_roundtrip(tmp_path):
    from cupoch_tpu.visualization import (
        ViewParameters,
        read_view_trajectory,
        write_view_trajectory,
    )

    tr = ViewTrajectory()
    vp = ViewParameters()
    vp.zoom = 0.42
    tr.view_status.append(vp)
    path = str(tmp_path / "traj.json")
    assert write_view_trajectory(path, tr)
    back = read_view_trajectory(path)
    assert len(back.view_status) == 1
    assert back.view_status[0].zoom == pytest.approx(0.42)


# -- visualizer ----------------------------------------------------------

def test_draw_geometries_to_file(tmp_path, rng):
    pcd = PointCloud(rng.uniform(size=(500, 3)).astype(np.float32))
    pcd.paint_uniform_color([0.2, 0.4, 0.8])
    ls = LineSet(np.asarray([[0, 0, 0], [1, 1, 1]], np.float32),
                 np.asarray([[0, 1]], np.int32))
    out = str(tmp_path / "scene.png")
    assert draw_geometries([pcd, ls], filename=out)
    assert os.path.getsize(out) > 1000


def test_visualizer_api(tmp_path, rng):
    vis = Visualizer()
    assert vis.create_window("w", 320, 240)
    vis.add_geometry(PointCloud(rng.uniform(size=(50, 3)).astype(np.float32)))
    assert vis.get_render_option().point_size > 0
    out = str(tmp_path / "cap.png")
    assert vis.capture_screen_image(out)
    assert os.path.exists(out)
    vis.clear_geometries()
    vis.destroy_window()


# -- dlpack --------------------------------------------------------------

def test_dlpack_roundtrip_numpy(rng):
    from cupoch_tpu.utility.dl_converter import from_dlpack, to_dlpack

    pts = rng.uniform(size=(100, 3)).astype(np.float32)
    pcd = PointCloud(pts)
    arr = np.from_dlpack(pcd.points)  # jax array implements __dlpack__
    np.testing.assert_allclose(arr, pts)
    back = from_dlpack(pcd.points)
    np.testing.assert_allclose(np.asarray(back), pts)


def test_dlpack_torch_interop(rng):
    torch = pytest.importorskip("torch")
    pts = rng.uniform(size=(64, 3)).astype(np.float32)
    pcd = PointCloud(pts)
    t = torch.from_dlpack(pcd.to_points_dlpack())
    np.testing.assert_allclose(t.numpy(), pts)
    # torch -> cupoch (from_torch_tensor demo,
    # examples/python/basic/from_torch_tensor.py)
    t2 = torch.rand(32, 3)
    pcd2 = PointCloud()
    pcd2.from_points_dlpack(t2)
    assert len(pcd2) == 32
    np.testing.assert_allclose(np.asarray(pcd2.points), t2.numpy(),
                               atol=1e-6)
