"""PointCloud factory constructors
(reference: src/cupoch/geometry/pointcloud_factory.cu).

All projections are fused jit kernels over whole images — the per-pixel
CUDA functors (depth_to_pointcloud_functor:43-82,
compute_points_from_disparity:259-285) become dense [H,W] meshgrid math
on the VPU; invalid pixels are masked and compacted host-side once.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utility import console


@partial(jax.jit, static_argnames=("stride",))
def _depth_to_points(depth, cam_pose, fx, fy, cx, cy, stride: int = 1):
    """Float depth image -> camera-frame points in world pose
    (depth_to_pointcloud_functor, pointcloud_factory.cu:43-82)."""
    d = depth[::stride, ::stride]
    H, W = d.shape
    col = (jnp.arange(W, dtype=jnp.float32) * stride)[None, :]
    row = (jnp.arange(H, dtype=jnp.float32) * stride)[:, None]
    z = d
    x = (col - cx) * z / fx
    y = (row - cy) * z / fy
    pts = jnp.stack([x, y, z], -1).reshape(-1, 3)
    pts = pts @ cam_pose[:3, :3].T + cam_pose[:3, 3]
    valid = (d > 0.0).reshape(-1)
    return pts, valid


def create_from_depth_image(depth, intrinsic, extrinsic=None,
                            depth_scale: float = 1000.0,
                            depth_trunc: float = 1000.0, stride: int = 1):
    """reference: PointCloud::CreateFromDepthImage,
    pointcloud_factory.cu:329-350."""
    from .pointcloud import PointCloud

    d = np.asarray(getattr(depth, "data", depth))
    if d.ndim == 3:
        if d.shape[2] != 1:
            console.log_error("[PointCloud::CreateFromDepthImage] "
                              "Unsupported image format.")
            return PointCloud()
        d = d[..., 0]
    if d.dtype == np.uint16:
        d = d.astype(np.float32) / float(depth_scale)
        d = np.where(d > depth_trunc, 0.0, d)
    elif d.dtype != np.float32:
        console.log_error("[PointCloud::CreateFromDepthImage] "
                          "Unsupported image format.")
        return PointCloud()
    T = np.eye(4, dtype=np.float32) if extrinsic is None else np.asarray(
        extrinsic, np.float32)
    cam_pose = np.linalg.inv(T)
    fx, fy = intrinsic.get_focal_length()
    cx, cy = intrinsic.get_principal_point()
    pts, valid = _depth_to_points(
        jnp.asarray(d, jnp.float32), jnp.asarray(cam_pose),
        jnp.float32(fx), jnp.float32(fy), jnp.float32(cx), jnp.float32(cy),
        stride=stride)
    keep = np.asarray(valid)
    return PointCloud(np.asarray(pts)[keep])


@jax.jit
def _rgbd_to_points(depth, color, cam_pose, fx, fy, cx, cy):
    H, W = depth.shape
    col = jnp.arange(W, dtype=jnp.float32)[None, :]
    row = jnp.arange(H, dtype=jnp.float32)[:, None]
    z = depth
    x = (col - cx) * z / fx
    y = (row - cy) * z / fy
    xyz_cam = jnp.stack([x, y, z], -1)
    pts = xyz_cam.reshape(-1, 3) @ cam_pose[:3, :3].T + cam_pose[:3, 3]
    valid = (depth > 0.0) & jnp.isfinite(depth)
    # image-gradient normals (compute_normals path in
    # CreatePointCloudFromRGBDImageT): cross of forward differences
    dx = jnp.diff(xyz_cam, axis=1, append=xyz_cam[:, -1:, :])
    dy = jnp.diff(xyz_cam, axis=0, append=xyz_cam[-1:, :, :])
    nrm = jnp.cross(dy, dx).reshape(-1, 3) @ cam_pose[:3, :3].T
    norm = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = jnp.where(norm > 1e-12, nrm / jnp.maximum(norm, 1e-12),
                    jnp.array([0.0, 0.0, 1.0]))
    return pts, color.reshape(-1, color.shape[-1]), nrm, valid.reshape(-1)


def create_from_rgbd_image(image, intrinsic, extrinsic=None,
                           project_valid_depth_only: bool = True,
                           depth_cutoff: float = -1.0,
                           compute_normals: bool = False):
    """reference: PointCloud::CreateFromRGBDImage,
    pointcloud_factory.cu:352-373."""
    from .pointcloud import PointCloud

    d = np.asarray(image.depth.data)
    if d.ndim == 3:
        d = d[..., 0]
    d = d.astype(np.float32)
    if depth_cutoff > 0:
        d = np.where(d > depth_cutoff, 0.0, d)
    c = np.asarray(image.color.data)
    if c.ndim == 2:
        c = c[..., None]
    if c.dtype == np.uint8:
        c = c.astype(np.float32) / 255.0
    if c.shape[-1] == 1:
        c = np.repeat(c, 3, -1)
    T = np.eye(4, dtype=np.float32) if extrinsic is None else np.asarray(
        extrinsic, np.float32)
    cam_pose = np.linalg.inv(T)
    fx, fy = intrinsic.get_focal_length()
    cx, cy = intrinsic.get_principal_point()
    pts, cols, nrms, valid = _rgbd_to_points(
        jnp.asarray(d), jnp.asarray(c, jnp.float32), jnp.asarray(cam_pose),
        jnp.float32(fx), jnp.float32(fy), jnp.float32(cx), jnp.float32(cy))
    pcd = PointCloud()
    if project_valid_depth_only:
        keep = np.asarray(valid)
        pcd.points = np.asarray(pts)[keep]
        pcd.colors = np.asarray(cols)[keep]
        if compute_normals:
            pcd.normals = np.asarray(nrms)[keep]
    else:
        mask = np.asarray(valid)
        p = np.asarray(pts)
        p[~mask] = np.nan
        pcd.points = p
        pcd.colors = np.asarray(cols)
        if compute_normals:
            pcd.normals = np.asarray(nrms)
    return pcd


def create_from_laserscanbuffer(scan, min_range: float, max_range: float):
    """reference: PointCloud::CreateFromLaserScanBuffer,
    pointcloud_factory.cu:375-416."""
    from .laserscanbuffer import _scan_to_points
    from .pointcloud import PointCloud

    if scan.is_empty():
        console.log_error("[PointCloud::CreateFromLaserScanBuffer] Empty "
                          "scan, return empty pointcloud.")
        return PointCloud()
    if min_range >= max_range:
        console.log_error("[PointCloud::CreateFromLaserScanBuffer] "
                          "min_range must be smaller than max_range.")
        return PointCloud()
    pts, ok = _scan_to_points(
        scan.ranges, scan.origins, jnp.float32(scan.min_angle_),
        jnp.float32(scan.get_angle_increment()), jnp.float32(min_range),
        jnp.float32(max_range))
    slot_mask = np.zeros(scan.num_max_scans_, bool)
    slot_mask[scan._slots()] = True
    keep = np.asarray(ok) & np.repeat(slot_mask, scan.num_steps_)
    pcd = PointCloud(np.asarray(pts)[keep])
    if scan.has_intensities():
        inten = np.asarray(scan.intensities).reshape(-1)[keep]
        pcd.colors = np.repeat(inten[:, None], 3, 1).astype(np.float32)
    return pcd


def create_from_occupancy_grid(occgrid):
    """Occupied voxel centers -> points
    (PointCloud::CreateFromOccupancyGrid,
    pointcloud_factory.cu:418-430)."""
    from .pointcloud import PointCloud

    idx, _, _ = occgrid.extract_occupied_voxels()
    if idx.shape[0] == 0:
        return PointCloud()
    half = occgrid.resolution // 2
    centers = (idx.astype(np.float32) - half + 0.5) * occgrid.voxel_size \
        + occgrid.origin
    return PointCloud(centers)


@jax.jit
def _disparity_to_points(disp, color, Q, color_scale):
    H, W = disp.shape
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    px = jnp.broadcast_to(Q[0, 0] * u + Q[0, 3], disp.shape)
    py = jnp.broadcast_to(Q[1, 1] * v + Q[1, 3], disp.shape)
    pz = jnp.full_like(disp, Q[2, 3])
    inv_w = 1.0 / (Q[3, 2] * disp + Q[3, 3])
    pts = jnp.stack([px * inv_w, py * inv_w, pz * inv_w], -1)
    cols = color.astype(jnp.float32) / color_scale
    return pts.reshape(-1, 3), cols.reshape(-1, 3), (disp > 0).reshape(-1)


def create_from_disparity(disp, color, left_intrinsic, right_intrinsic,
                          baseline: float):
    """OpenCV-style Q-matrix reprojection
    (PointCloud::CreateFromDisparity, pointcloud_factory.cu:432-482)."""
    from .pointcloud import PointCloud

    d = np.asarray(getattr(disp, "data", disp))
    if d.ndim == 3:
        d = d[..., 0]
    c = np.asarray(getattr(color, "data", color))
    if c.ndim == 2:
        c = np.repeat(c[..., None], 3, -1)
    if d.shape[:2] != c.shape[:2]:
        console.log_error("[PointCloud::CreateFromDisparity] Unsupported "
                          "image format.")
        return PointCloud()
    tx = -float(baseline)
    fxl, fyl = left_intrinsic.get_focal_length()
    cxl, cyl = left_intrinsic.get_principal_point()
    cxr, _ = right_intrinsic.get_principal_point()
    Q = np.zeros((4, 4), np.float32)
    Q[0, 0] = fyl * tx
    Q[0, 3] = -fyl * cxl * tx
    Q[1, 1] = fxl * tx
    Q[1, 3] = -fxl * cyl * tx
    Q[2, 3] = fxl * fyl * tx
    Q[3, 2] = -fyl
    Q[3, 3] = fyl * (cxl - cxr)
    color_scale = 65535.0 if c.dtype == np.uint16 else 255.0
    pts, cols, valid = _disparity_to_points(
        jnp.asarray(d, jnp.float32), jnp.asarray(c),
        jnp.asarray(Q), jnp.float32(color_scale))
    keep = np.asarray(valid) & np.isfinite(np.asarray(pts)).all(-1)
    pcd = PointCloud(np.asarray(pts)[keep])
    pcd.colors = np.asarray(cols)[keep]
    return pcd
