"""RGB-D odometry driver.

reference: src/cupoch/odometry/odometry.h:39-59 / odometry.cu
(ComputeRGBDOdometryT pipeline). Host orchestrates the coarse-to-fine
schedule (static shapes per pyramid level); each level runs as one
compiled fori_loop (odometry_core.level_odometry).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..geometry.image import FilterType, Image, RGBDImage
from ..utility import console
from . import odometry_core as core


class OdometryOption:
    """reference: odometry/odometry_option.h:31-60 (same defaults)."""

    def __init__(self,
                 iteration_number_per_pyramid_level: Optional[List[int]] = None,
                 max_depth_diff: float = 0.03,
                 min_depth: float = 0.0,
                 max_depth: float = 4.0,
                 nu: float = 5.0,
                 sigma2_init: float = 1.0,
                 inv_sigma_mat_diag=None):
        self.iteration_number_per_pyramid_level = (
            [20, 10, 5] if iteration_number_per_pyramid_level is None
            else list(iteration_number_per_pyramid_level))
        self.max_depth_diff = float(max_depth_diff)
        self.min_depth = float(min_depth)
        self.max_depth = float(max_depth)
        self.nu = float(nu)
        self.sigma2_init = float(sigma2_init)
        self.inv_sigma_mat_diag = (
            np.zeros(6, np.float32) if inv_sigma_mat_diag is None
            else np.asarray(inv_sigma_mat_diag, np.float32))


class RGBDOdometryJacobian:
    jac_type = "color"


class RGBDOdometryJacobianFromColorTerm(RGBDOdometryJacobian):
    """Steinbruecker photometric term (reference:
    rgbdodometry_jacobian.h:76-100)."""

    jac_type = "color"


class RGBDOdometryJacobianFromHybridTerm(RGBDOdometryJacobian):
    """Park hybrid photometric+geometric term (reference:
    rgbdodometry_jacobian.h:103-130)."""

    jac_type = "hybrid"


def _chan0(img: Image) -> jnp.ndarray:
    d = img.data.astype(jnp.float32)
    return d[..., 0]


def _preprocess_depth(depth: jnp.ndarray, option: OdometryOption) -> jnp.ndarray:
    """Out-of-range depth -> NaN (reference: preprocess_depth_functor,
    odometry.cu:444-456)."""
    bad = (depth < option.min_depth) | (depth > option.max_depth) | (depth <= 0)
    return jnp.where(bad, jnp.nan, depth)


def _initialize(source: RGBDImage, target: RGBDImage, intrinsic, odo_init,
                option: OdometryOption):
    """reference: InitializeRGBDOdometry (odometry.cu:499-529)."""
    src_gray = source.color.filter(FilterType.Gaussian3)
    tgt_gray = target.color.filter(FilterType.Gaussian3)
    sd = _preprocess_depth(_chan0(source.depth), option)
    td = _preprocess_depth(_chan0(target.depth), option)
    sd = core.jnp_filter_gaussian3(sd)
    td = core.jnp_filter_gaussian3(td)

    K = jnp.asarray(intrinsic.intrinsic_matrix, jnp.float32)
    sc = _chan0(src_gray)
    tc = _chan0(tgt_gray)
    scale_s, scale_t = core.normalize_intensity_scales(
        sc, tc, sd, td, K, jnp.asarray(odo_init, jnp.float32),
        jnp.float32(option.max_depth_diff))
    return sc * scale_s, sd, tc * scale_t, td


def _camera_matrix_pyramid(intrinsic, levels: int):
    """reference: CreateCameraMatrixPyramid (odometry.cu:332-346)."""
    mats = [np.asarray(intrinsic.intrinsic_matrix, np.float32)]
    for _ in range(1, levels):
        m = 0.5 * mats[-1]
        m[2, 2] = 1.0
        mats.append(m)
    return mats


def _pyramid(img: jnp.ndarray, levels: int, smooth: bool):
    out = [img]
    for _ in range(1, levels):
        x = out[-1]
        if smooth:
            x = core.jnp_filter_gaussian3(x)
        out.append(core.jnp_downsample2(x))
    return out


def compute_rgbd_odometry(
    rgbd_source: RGBDImage,
    rgbd_target: RGBDImage,
    pinhole_camera_intrinsic,
    odo_init=None,
    jacobian: RGBDOdometryJacobian = RGBDOdometryJacobianFromHybridTerm(),
    option: OdometryOption = None,
) -> Tuple[bool, np.ndarray, np.ndarray]:
    """Estimate the 4x4 motion from source to target RGBD frame.

    reference: ComputeRGBDOdometry (odometry.h:39-47). Returns
    (is_success, 4x4 transformation, 6x6 information matrix).
    """
    option = option or OdometryOption()
    if (rgbd_source.color.width != rgbd_target.color.width or
            rgbd_source.color.height != rgbd_target.color.height):
        console.log_warning("[RGBDOdometry] Two RGBD pairs should be same in size.")
        return False, np.eye(4, dtype=np.float32), np.zeros((6, 6), np.float32)

    odo_init = np.eye(4, dtype=np.float32) if odo_init is None else np.asarray(
        odo_init, np.float32)
    sc, sd, tc, td = _initialize(
        rgbd_source, rgbd_target, pinhole_camera_intrinsic, odo_init, option)

    iter_counts = option.iteration_number_per_pyramid_level
    levels = len(iter_counts)
    sc_p = _pyramid(sc, levels, True)
    sd_p = _pyramid(sd, levels, False)
    tc_p = _pyramid(tc, levels, True)
    td_p = _pyramid(td, levels, False)
    K_p = _camera_matrix_pyramid(pinhole_camera_intrinsic, levels)

    T = jnp.asarray(odo_init, jnp.float32)
    if not np.any(np.asarray(T)):
        T = jnp.eye(4, dtype=jnp.float32)
    for level in range(levels - 1, -1, -1):
        tgt_c, tgt_d = tc_p[level], td_p[level]
        dx_c = core.jnp_filter_sobel_dx(tgt_c)
        dy_c = core.jnp_filter_sobel_dy(tgt_c)
        dx_d = core.jnp_filter_sobel_dx(tgt_d)
        dy_d = core.jnp_filter_sobel_dy(tgt_d)
        T, ok = core.level_odometry(
            sc_p[level], sd_p[level], tgt_c, tgt_d,
            dx_c, dx_d, dy_c, dy_d,
            jnp.asarray(K_p[level], jnp.float32), T,
            jnp.float32(option.max_depth_diff),
            jacobian.jac_type, iter_counts[levels - level - 1])
        if not bool(ok):
            console.log_warning("[ComputeOdometry] no solution!")
            return False, np.eye(4, dtype=np.float32), np.zeros((6, 6), np.float32)

    info = core.information_matrix(
        sd_p[0], td_p[0], jnp.asarray(K_p[0], jnp.float32), T,
        jnp.float32(option.max_depth_diff))
    return True, np.asarray(T), np.asarray(info)


def compute_weighted_rgbd_odometry(
    rgbd_source: RGBDImage,
    rgbd_target: RGBDImage,
    pinhole_camera_intrinsic,
    odo_init=None,
    prev_twist=None,
    jacobian: RGBDOdometryJacobian = RGBDOdometryJacobianFromHybridTerm(),
    option: OdometryOption = None,
) -> Tuple[bool, np.ndarray, np.ndarray, np.ndarray]:
    """t-distribution-weighted odometry with twist prior.

    reference: ComputeWeightedRGBDOdometry (odometry.h:49-59). Returns
    (is_success, 4x4 transformation, prev_twist, 6x6 information).
    """
    option = option or OdometryOption()
    odo_init = np.eye(4, dtype=np.float32) if odo_init is None else np.asarray(
        odo_init, np.float32)
    prev_twist = np.zeros(6, np.float32) if prev_twist is None else np.asarray(
        prev_twist, np.float32)
    sc, sd, tc, td = _initialize(
        rgbd_source, rgbd_target, pinhole_camera_intrinsic, odo_init, option)

    iter_counts = option.iteration_number_per_pyramid_level
    levels = len(iter_counts)
    sc_p = _pyramid(sc, levels, True)
    sd_p = _pyramid(sd, levels, False)
    tc_p = _pyramid(tc, levels, True)
    td_p = _pyramid(td, levels, False)
    K_p = _camera_matrix_pyramid(pinhole_camera_intrinsic, levels)

    T = jnp.asarray(odo_init, jnp.float32)
    if not np.any(np.asarray(T)):
        T = jnp.eye(4, dtype=jnp.float32)
    curr_vel = jnp.eye(4, dtype=jnp.float32)
    sigma2 = option.sigma2_init
    for level in range(levels - 1, -1, -1):
        tgt_c, tgt_d = tc_p[level], td_p[level]
        dx_c = core.jnp_filter_sobel_dx(tgt_c)
        dy_c = core.jnp_filter_sobel_dy(tgt_c)
        dx_d = core.jnp_filter_sobel_dx(tgt_d)
        dy_d = core.jnp_filter_sobel_dy(tgt_d)
        T, curr_vel, sigma2 = core.level_odometry_weighted(
            sc_p[level], sd_p[level], tgt_c, tgt_d,
            dx_c, dx_d, dy_c, dy_d,
            jnp.asarray(K_p[level], jnp.float32), T,
            jnp.float32(option.max_depth_diff), jnp.float32(option.nu),
            jnp.float32(sigma2),
            jnp.asarray(option.inv_sigma_mat_diag, jnp.float32),
            jnp.asarray(prev_twist, jnp.float32), curr_vel,
            jacobian.jac_type, iter_counts[levels - level - 1])

    from ..utility.transforms import log_se3

    info = core.information_matrix(
        sd_p[0], td_p[0], jnp.asarray(K_p[0], jnp.float32), T,
        jnp.float32(option.max_depth_diff))
    return True, np.asarray(T), np.asarray(log_se3(curr_vel)), np.asarray(info)
