"""IO tests: file round-trips, bundled reference data, LZF, ROS codecs.

reference test model: src/tests/io/ + examples/testdata (SURVEY.md §4).
"""
import os

import numpy as np
import pytest

from cupoch_tpu import io
from cupoch_tpu import native
from cupoch_tpu.geometry import PointCloud, TriangleMesh
from cupoch_tpu.geometry.image import Image
from cupoch_tpu.io.ros import (
    PointCloud2MsgInfo,
    create_from_pointcloud2_msg,
    create_to_pointcloud2_msg,
)

TESTDATA = "/root/reference/examples/testdata"
needs_testdata = pytest.mark.skipif(
    not os.path.isdir(TESTDATA), reason="reference testdata not mounted")


def make_cloud(rng, n=100, normals=True, colors=True):
    pcd = PointCloud(rng.uniform(size=(n, 3)).astype(np.float32))
    if normals:
        nrm = rng.normal(size=(n, 3)).astype(np.float32)
        pcd.normals = nrm / np.linalg.norm(nrm, axis=1, keepdims=True)
    if colors:
        # quantised to u8 so round-trip through file formats is exact
        pcd.colors = (rng.integers(0, 256, size=(n, 3)) / 255.0).astype(
            np.float32)
    return pcd


# ---------------------------------------------------------------------------
# LZF codec (native)
# ---------------------------------------------------------------------------

def test_lzf_roundtrip(rng):
    for size in (1000, 65536):
        raw = rng.integers(0, 8, size=size).astype(np.uint8).tobytes()
        comp = native.lzf_compress(raw)
        assert comp is not None and 0 < len(comp) < len(raw)
        back = native.lzf_decompress(comp, len(raw))
        assert back == raw


def test_lzf_incompressible(rng):
    raw = rng.integers(0, 256, size=4096).astype(np.uint8).tobytes()
    comp = native.lzf_compress(raw)
    if comp is not None:
        assert native.lzf_decompress(comp, len(raw)) == raw


# ---------------------------------------------------------------------------
# PointCloud file formats
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ext", ["ply", "pcd", "xyz"])
@pytest.mark.parametrize("ascii_mode", [False, True])
def test_pointcloud_roundtrip(tmp_path, rng, ext, ascii_mode):
    pcd = make_cloud(rng)
    path = str(tmp_path / f"cloud.{ext}")
    assert io.write_point_cloud(path, pcd, write_ascii=ascii_mode)
    back = io.read_point_cloud(path)
    np.testing.assert_allclose(
        np.asarray(back.points), np.asarray(pcd.points), atol=1e-4)
    if ext != "xyz":
        assert back.has_colors()
        np.testing.assert_allclose(
            np.asarray(back.colors), np.asarray(pcd.colors), atol=1 / 255.0)


def test_pcd_binary_compressed_roundtrip(tmp_path, rng):
    pcd = make_cloud(rng, n=500)
    path = str(tmp_path / "cloud.pcd")
    assert io.write_point_cloud(path, pcd, compressed=True)
    back = io.read_point_cloud(path)
    np.testing.assert_allclose(
        np.asarray(back.points), np.asarray(pcd.points), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back.normals), np.asarray(pcd.normals), atol=1e-6)


@needs_testdata
def test_read_fragment_pcd():
    pcd = io.read_point_cloud(os.path.join(TESTDATA, "fragment.pcd"))
    # header: 113662 points (SURVEY.md §4); some may be NaN-dropped
    assert 113000 <= len(pcd) <= 113662
    pts = np.asarray(pcd.points)
    assert np.isfinite(pts).all()
    assert pcd.has_colors()


@needs_testdata
def test_read_bunny_ply_as_cloud():
    pcd = io.read_point_cloud(os.path.join(TESTDATA, "bathtub_0154.ply"))
    assert len(pcd) > 1000


# ---------------------------------------------------------------------------
# TriangleMesh file formats
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ext", ["ply", "obj", "stl"])
def test_mesh_roundtrip(tmp_path, rng, ext):
    from cupoch_tpu.geometry.trianglemesh_factory import create_box

    mesh = create_box()
    path = str(tmp_path / f"mesh.{ext}")
    assert io.write_triangle_mesh(path, mesh)
    back = io.read_triangle_mesh(path)
    if ext == "stl":  # STL stores per-face verts; counts differ
        assert len(np.asarray(back.triangles)) == len(
            np.asarray(mesh.triangles))
    else:
        np.testing.assert_allclose(
            np.asarray(back.vertices), np.asarray(mesh.vertices), atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(back.triangles), np.asarray(mesh.triangles))


@needs_testdata
def test_read_knot_ply():
    mesh = io.read_triangle_mesh(os.path.join(TESTDATA, "knot.ply"))
    assert len(np.asarray(mesh.vertices)) == 1440
    assert len(np.asarray(mesh.triangles)) == 2880


# ---------------------------------------------------------------------------
# Image IO
# ---------------------------------------------------------------------------

@needs_testdata
def test_read_depth_png_uint16():
    img = io.read_image(os.path.join(TESTDATA, "depth.png"))
    arr = img.to_numpy()
    assert arr.dtype == np.uint16
    assert arr.shape[:2] == (480, 640)


@needs_testdata
def test_read_color_jpg(tmp_path):
    img = io.read_image(os.path.join(TESTDATA, "lena_color.jpg"))
    arr = img.to_numpy()
    assert arr.dtype == np.uint8 and arr.shape[2] == 3
    out = str(tmp_path / "out.png")
    assert io.write_image(out, img)
    back = io.read_image(out)
    np.testing.assert_array_equal(back.to_numpy(), arr)


def test_image_roundtrip_gray(tmp_path, rng):
    arr = rng.integers(0, 256, size=(32, 40, 1)).astype(np.uint8)
    path = str(tmp_path / "g.png")
    assert io.write_image(path, Image(arr))
    back = io.read_image(path).to_numpy()
    np.testing.assert_array_equal(back[..., 0], arr[..., 0])


# ---------------------------------------------------------------------------
# JSON camera IO
# ---------------------------------------------------------------------------

@needs_testdata
def test_read_camera_intrinsic_json():
    intr = io.read_pinhole_camera_intrinsic(
        os.path.join(TESTDATA, "camera_primesense.json"))
    assert intr.width == 640 and intr.height == 480
    fx, fy = intr.get_focal_length()
    assert fx == pytest.approx(525.0) and fy == pytest.approx(525.0)


def test_camera_intrinsic_json_roundtrip(tmp_path):
    from cupoch_tpu.camera import PinholeCameraIntrinsic

    intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
    path = str(tmp_path / "cam.json")
    assert io.write_pinhole_camera_intrinsic(path, intr)
    back = io.read_pinhole_camera_intrinsic(path)
    assert back.width == 640 and back.height == 480
    np.testing.assert_allclose(
        np.asarray(back.intrinsic_matrix), np.asarray(intr.intrinsic_matrix))


# ---------------------------------------------------------------------------
# ROS codecs
# ---------------------------------------------------------------------------

def test_pointcloud2_msg_roundtrip(rng):
    pcd = make_cloud(rng, n=64, normals=False, colors=True)
    info = PointCloud2MsgInfo.default_dense_color(64)
    data, info = create_to_pointcloud2_msg(pcd, info)
    back = create_from_pointcloud2_msg(data, info)
    np.testing.assert_allclose(
        np.asarray(back.points), np.asarray(pcd.points), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back.colors), np.asarray(pcd.colors), atol=1 / 255.0)


def test_image_msg_roundtrip(rng):
    from cupoch_tpu.io.ros import create_from_image_msg, create_to_image_msg

    arr = rng.integers(0, 256, size=(24, 32, 3)).astype(np.uint8)
    img = Image(arr)
    data, info = create_to_image_msg(img)
    back = create_from_image_msg(data, info)
    np.testing.assert_array_equal(back.to_numpy(), arr)


def test_voxel_grid_ply_roundtrip(tmp_path, rng):
    import jax.numpy as jnp

    from cupoch_tpu.geometry.voxelgrid import VoxelGrid
    from cupoch_tpu.io import read_voxel_grid, write_voxel_grid

    vg = VoxelGrid()
    vg.voxel_size = 0.05
    vg.origin = np.asarray([0.5, -1.0, 2.0], np.float32)
    keys = rng.integers(0, 64, size=(100, 3)).astype(np.int32)
    keys = np.unique(keys, axis=0)
    vg.voxels_keys = jnp.asarray(keys)
    vg.voxels_colors = jnp.asarray(
        rng.uniform(size=(len(keys), 3)).astype(np.float32))
    for ascii_mode in (False, True):
        path = str(tmp_path / f"vg_{ascii_mode}.ply")
        assert write_voxel_grid(path, vg, write_ascii=ascii_mode)
        vg2 = read_voxel_grid(path)
        assert abs(vg2.voxel_size - vg.voxel_size) < 1e-9
        np.testing.assert_allclose(vg2.origin, vg.origin, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(vg2.voxels_keys), keys)
        np.testing.assert_allclose(np.asarray(vg2.voxels_colors),
                                   np.asarray(vg.voxels_colors),
                                   atol=1.0 / 255.0)


def test_view_trajectory_json_roundtrip(tmp_path):
    from cupoch_tpu.visualization import (
        ViewParameters,
        ViewTrajectory,
        read_view_trajectory,
        write_view_trajectory,
    )

    traj = ViewTrajectory()
    traj.is_loop = True
    traj.interval = 10
    for i in range(4):
        vp = ViewParameters()
        vp.field_of_view = 60.0 + i
        vp.zoom = 0.5 + 0.1 * i
        vp.lookat = np.asarray([i, 0.0, 1.0])
        traj.view_status.append(vp)
    path = str(tmp_path / "traj.json")
    assert write_view_trajectory(path, traj)
    traj2 = read_view_trajectory(path)
    assert traj2.is_loop and traj2.interval == 10
    assert len(traj2.view_status) == 4
    np.testing.assert_allclose(traj2.view_status[2].lookat,
                               [2.0, 0.0, 1.0])
    # interpolation hits the key frames exactly at segment starts
    ok, f0 = traj2.get_interpolated_frame(0)
    assert ok
    np.testing.assert_allclose(f0.field_of_view, 60.0, atol=1e-9)
    ok, f1 = traj2.get_interpolated_frame(11)
    assert ok
    np.testing.assert_allclose(f1.field_of_view, 61.0, atol=1e-9)
    assert traj2.num_of_frames() == 44
