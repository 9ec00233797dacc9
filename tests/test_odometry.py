"""RGB-D odometry tests.

Modeled on the reference's deterministic image generator
(src/tests/odometry/odometry_tools.cpp GenerateRGBDImage): render a
smooth synthetic scene, warp the camera by a known small SE(3) motion,
and require the estimator to recover it.
"""
import numpy as np
import pytest

from cupoch_tpu.camera import PinholeCameraIntrinsic
from cupoch_tpu.geometry import Image, RGBDImage
from cupoch_tpu.odometry import (
    OdometryOption,
    RGBDOdometryJacobianFromColorTerm,
    RGBDOdometryJacobianFromHybridTerm,
    compute_rgbd_odometry,
    compute_weighted_rgbd_odometry,
)

H, W = 60, 80
FX = FY = 60.0
CX, CY = (W - 1) / 2.0, (H - 1) / 2.0


def render(T_cam):
    """Render depth+intensity of a textured slanted plane z = 2 + 0.2x + 0.1y
    (world frame) from camera pose T_cam (world->cam)."""
    R = T_cam[:3, :3]
    t = T_cam[:3, 3]
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    # ray dir in cam frame
    d_cam = np.stack([(uu - CX) / FX, (vv - CY) / FY, np.ones_like(uu)], -1)
    d_world = d_cam @ R  # R^T rows
    o_world = (-R.T @ t)
    # plane: z = 2 + 0.2x + 0.1y -> n.p = 2 with n=(-0.2,-0.1,1)
    n = np.array([-0.2, -0.1, 1.0])
    denom = d_world @ n
    s = (2.0 - o_world @ n) / denom
    p_world = o_world + s[..., None] * d_world
    depth = s * 1.0  # distance along ray; z-depth in cam = s * d_cam_z = s
    # smooth texture from world position
    intensity = (0.5 + 0.15 * np.sin(7.0 * p_world[..., 0]) * np.cos(
        5.0 * p_world[..., 1]) + 0.1 * np.sin(3.0 * p_world[..., 0] +
                                              2.0 * p_world[..., 1]))
    return (intensity.astype(np.float32),
            depth.astype(np.float32))


def make_rgbd(intensity, depth):
    return RGBDImage(Image(intensity[..., None]),
                     Image(depth[..., None]))


def intrinsic():
    return PinholeCameraIntrinsic(W, H, FX, FY, CX, CY)


def small_motion():
    a = 0.01
    Rz = np.array([[np.cos(a), -np.sin(a), 0],
                   [np.sin(a), np.cos(a), 0],
                   [0, 0, 1]], np.float64)
    T = np.eye(4)
    T[:3, :3] = Rz
    T[:3, 3] = [0.01, -0.005, 0.008]
    return T


@pytest.mark.parametrize("jac,tol", [
    (RGBDOdometryJacobianFromHybridTerm(), 8e-3),
    # photometric-only is weakly observable on a planar scene; it must
    # still reduce the error well below the motion magnitude
    (RGBDOdometryJacobianFromColorTerm(), 3e-2),
])
def test_recovers_small_motion(jac, tol):
    T_true = small_motion()
    src_i, src_d = render(np.eye(4))
    tgt_i, tgt_d = render(T_true)
    opt = OdometryOption(max_depth_diff=0.1)
    ok, T_est, info = compute_rgbd_odometry(
        make_rgbd(src_i, src_d), make_rgbd(tgt_i, tgt_d), intrinsic(),
        np.eye(4, dtype=np.float32), jac, opt)
    assert ok
    # T_est maps source camera into target camera: should equal T_true
    err = np.linalg.inv(T_true) @ T_est
    assert np.linalg.norm(err[:3, 3]) < tol
    assert np.linalg.norm(err[:3, :3] - np.eye(3)) < tol
    assert info.shape == (6, 6)
    assert np.all(np.linalg.eigvalsh(info.astype(np.float64)) > 0)


def test_identity_motion():
    src_i, src_d = render(np.eye(4))
    ok, T_est, _ = compute_rgbd_odometry(
        make_rgbd(src_i, src_d), make_rgbd(src_i, src_d), intrinsic(),
        np.eye(4, dtype=np.float32), RGBDOdometryJacobianFromHybridTerm(),
        OdometryOption(max_depth_diff=0.1))
    assert ok
    assert np.linalg.norm(T_est - np.eye(4)) < 1e-3


def test_weighted_odometry_runs():
    T_true = small_motion()
    src_i, src_d = render(np.eye(4))
    tgt_i, tgt_d = render(T_true)
    ok, T_est, twist, info = compute_weighted_rgbd_odometry(
        make_rgbd(src_i, src_d), make_rgbd(tgt_i, tgt_d), intrinsic(),
        np.eye(4, dtype=np.float32), np.zeros(6, np.float32),
        RGBDOdometryJacobianFromHybridTerm(), OdometryOption(max_depth_diff=0.1))
    assert ok
    err = np.linalg.inv(T_true) @ T_est
    assert np.linalg.norm(err[:3, 3]) < 2e-2
    assert twist.shape == (6,)


def test_size_mismatch_fails():
    src_i, src_d = render(np.eye(4))
    ok, _, _ = compute_rgbd_odometry(
        make_rgbd(src_i, src_d),
        make_rgbd(src_i[:30], src_d[:30]), intrinsic())
    assert not ok
