"""KinFu pipeline tests (reference model: kinfu.cpp smoke behavior;
the reference has no kinfu unit tests, so these validate tracking on a
synthetic analytically-rendered scene)."""
import math

import numpy as np
import pytest

from cupoch_tpu.camera import PinholeCameraIntrinsic
from cupoch_tpu.geometry import Image, RGBDImage
from cupoch_tpu.kinfu import KinfuOption, KinfuPipeline

W, H = 64, 48
FX = FY = 50.0
CX, CY = (W - 1) / 2.0, (H - 1) / 2.0


def intrinsic():
    return PinholeCameraIntrinsic(W, H, FX, FY, CX, CY)


def render_scene_depth(cam_pose, planes, w=W, h=H):
    """Depth of the nearest intersection among planes [(n, d)] seen
    from the camera-to-world pose (concave room corner: the camera is
    inside the region, each ray exits through the closest plane)."""
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    rays = np.stack([(u - CX) / FX, (v - CY) / FY, np.ones_like(u)],
                    -1).astype(np.float32)
    Rw = cam_pose[:3, :3]
    c = cam_pose[:3, 3]
    dirs = rays @ Rw.T
    best = np.full((h, w), np.inf, np.float32)
    for normal, d in planes:
        n = np.asarray(normal, np.float32)
        denom = dirs @ n
        safe = np.where(np.abs(denom) > 1e-6, denom, 1.0)
        t = (d - c @ n) / safe
        t = np.where((np.abs(denom) > 1e-6) & (t > 0), t, np.inf)
        best = np.minimum(best, t.astype(np.float32))
    # convert ray parameter (along unit-z ray) to z-depth
    return np.where(np.isfinite(best), best, 0.0).astype(np.float32)


def render_plane_depth(cam_pose, normal, d, w=W, h=H):
    return render_scene_depth(cam_pose, [(normal, d)], w, h)


def make_rgbd(depth):
    color = np.full((H, W, 3), 0.5, np.float32)
    return RGBDImage(Image(color), Image(depth[..., None]))


def small_option():
    return KinfuOption(
        num_pyramid_levels=2,
        depth_cutoff=5.0,
        tsdf_length=4.0,
        tsdf_resolution=64,
        sdf_trunc=0.2,
        tsdf_origin=(0.0, 0.0, 2.0),
        distance_threshold=0.3,
        icp_iterations=[5, 5],
    )


# slanted plane so point-to-plane ICP observes all translations
NORMAL = np.asarray([0.3, 0.2, -1.0], np.float32)
NORMAL_ = NORMAL / np.linalg.norm(NORMAL)
D = -1.5  # plane n.p = d, in front of camera (+z view direction)


def test_process_frame_and_extract():
    pipe = KinfuPipeline(intrinsic(), small_option())
    depth = render_plane_depth(np.eye(4, dtype=np.float32), NORMAL_, D)
    assert pipe.process_frame(make_rgbd(depth))
    assert pipe.frame_id == 1
    np.testing.assert_allclose(pipe.cur_pose, np.eye(4), atol=1e-6)
    # model pyramid is populated
    assert all(m is not None for m in pipe.model_pyramid)
    assert len(pipe.model_pyramid[0]) > 0
    pcd = pipe.extract_point_cloud()
    assert len(pcd) > 0
    # extracted surface lies on the plane
    err = np.abs(np.asarray(pcd.points) @ NORMAL_ - D)
    assert np.median(err) < 0.05


def test_static_camera_stays_put():
    pipe = KinfuPipeline(intrinsic(), small_option())
    depth = render_plane_depth(np.eye(4, dtype=np.float32), NORMAL_, D)
    assert pipe.process_frame(make_rgbd(depth))
    assert pipe.process_frame(make_rgbd(depth))
    t = pipe.cur_pose[:3, 3]
    assert np.linalg.norm(t) < 0.02
    R = pipe.cur_pose[:3, :3]
    assert np.abs(R - np.eye(3)).max() < 0.02


# room corner: three mutually-orthogonal walls in view -> all 6 DoF
# observable by point-to-plane ICP
CORNER = [
    (np.asarray([0.0, 0.0, -1.0], np.float32), -2.2),   # back wall z=2.2
    (np.asarray([-1.0, 0.0, -0.2], np.float32) / math.sqrt(1.04), -1.0),
    (np.asarray([0.0, -1.0, -0.2], np.float32) / math.sqrt(1.04), -0.8),
]


def test_tracks_small_translation():
    pipe = KinfuPipeline(intrinsic(), small_option())
    pose0 = np.eye(4, dtype=np.float32)
    assert pipe.process_frame(make_rgbd(
        render_scene_depth(pose0, CORNER)))
    pose1 = np.eye(4, dtype=np.float32)
    pose1[:3, 3] = [0.02, -0.01, 0.015]
    assert pipe.process_frame(make_rgbd(
        render_scene_depth(pose1, CORNER)))
    err = np.linalg.norm(pipe.cur_pose[:3, 3] - pose1[:3, 3])
    assert err < 0.015, f"tracked translation off by {err}"


def test_reset():
    pipe = KinfuPipeline(intrinsic(), small_option())
    depth = render_plane_depth(np.eye(4, dtype=np.float32), NORMAL_, D)
    pipe.process_frame(make_rgbd(depth))
    pipe.reset()
    assert pipe.frame_id == 0
    np.testing.assert_allclose(pipe.cur_pose, np.eye(4))
    assert all(m is None for m in pipe.model_pyramid)


def test_rejects_empty_frame():
    pipe = KinfuPipeline(intrinsic(), small_option())
    assert not pipe.process_frame(RGBDImage())
