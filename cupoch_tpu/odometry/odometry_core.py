"""Jit-safe RGB-D odometry kernels.

reference: src/cupoch/odometry/odometry.cu + rgbdodometry_jacobian.inl.
The reference compacts per-pixel correspondences into a device list and
runs one fused jacobian+reduce per iteration (odometry.cu:585-631).
Here each pyramid level is ONE compiled `lax.fori_loop`: every
iteration recomputes the dense [H, W] correspondence mask by depth
reprojection, forms the (photo, geo) jacobians for every pixel, and
reduces the masked 6x6 Gauss-Newton system with an MXU matmul — no
compaction, no host sync inside a level.

Invalid depth is carried as NaN exactly like the reference
(preprocess_depth_functor, odometry.cu:444-456).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..geometry import image_ops
from ..utility import eigen as ueigen

# reference: rgbdodometry_jacobian.inl:34-35
SOBEL_SCALE = 0.125
LAMBDA_HYBRID_DEPTH = 0.968


# [H, W] wrappers over the [H, W, C] image kernels
def jnp_filter_gaussian3(x):
    return image_ops.filter_gaussian3(x[..., None])[..., 0]


def jnp_filter_sobel_dx(x):
    return image_ops.filter_sobel_dx(x[..., None])[..., 0]


def jnp_filter_sobel_dy(x):
    return image_ops.filter_sobel_dy(x[..., None])[..., 0]


def jnp_downsample2(x):
    return image_ops.downsample2(x[..., None])[..., 0]


def _pixel_grid(H: int, W: int):
    uu, vv = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))
    return uu, vv


def compute_correspondence(depth_s, depth_t, K, T, max_depth_diff):
    """Dense reprojection correspondence.

    reference: compute_correspondence_map (odometry.cu:155-203). For
    every source pixel with finite depth, reproject into the target
    with u,v = K R K^-1 [u_s v_s 1] d_s + K t and accept when the
    transformed depth agrees with the target depth within
    max_depth_diff. Returns (u_t [H,W] int32, v_t, transformed_d_s,
    valid mask).
    """
    H, W = depth_s.shape
    uu, vv = _pixel_grid(H, W)
    R = T[:3, :3]
    t = T[:3, 3]
    K_inv = jnp.linalg.inv(K)
    hi = jax.lax.Precision.HIGHEST
    KRK_inv = jnp.matmul(jnp.matmul(K, R, precision=hi), K_inv,
                         precision=hi)
    Kt = jnp.matmul(K, t, precision=hi)
    d_s = depth_s
    valid_s = jnp.isfinite(d_s)
    ds0 = jnp.where(valid_s, d_s, 0.0)
    uvw = jnp.stack([uu, vv, jnp.ones_like(uu)], -1)  # [H,W,3]
    proj = ds0[..., None] * jnp.matmul(
        uvw, KRK_inv.T, precision=jax.lax.Precision.HIGHEST) + Kt
    z = proj[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-8, z, 1.0)
    u_t = jnp.floor(proj[..., 0] / safe_z + 0.5).astype(jnp.int32)
    v_t = jnp.floor(proj[..., 1] / safe_z + 0.5).astype(jnp.int32)
    inb = (u_t >= 0) & (u_t < W) & (v_t >= 0) & (v_t < H) & valid_s & (z > 0)
    u_tc = jnp.clip(u_t, 0, W - 1)
    v_tc = jnp.clip(v_t, 0, H - 1)
    d_t = depth_t[v_tc, u_tc]
    ok = inb & jnp.isfinite(d_t) & (jnp.abs(z - d_t) <= max_depth_diff)
    return u_tc, v_tc, z, ok


def _gather(img, v, u):
    return img[v, u]


def depth_to_xyz(depth, K):
    """[H,W] depth -> [H,W,3] camera-frame xyz (reference:
    convert_depth_to_xyz_image_functor, odometry.cu:273-306)."""
    H, W = depth.shape
    uu, vv = _pixel_grid(H, W)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z = depth
    x = (uu - cx) * z / fx
    y = (vv - cy) * z / fy
    return jnp.stack([x, y, z], -1)


def _jacobians(jac_type: str, src_color, src_depth, tgt_color, tgt_depth,
               src_xyz, dx_color, dx_depth, dy_color, dy_depth, K, T,
               u_t, v_t, ok):
    """Per-pixel (J[2,6], r[2]) arrays, masked by ``ok``.

    reference: RGBDOdometryJacobianFromColorTerm /
    FromHybridTerm::ComputeJacobianAndResidual
    (rgbdodometry_jacobian.inl:40-175). Identical math, vectorized.
    """
    fx, fy = K[0, 0], K[1, 1]
    R = T[:3, :3]
    t = T[:3, 3]

    I_t = _gather(tgt_color, v_t, u_t)
    diff_photo = I_t - src_color
    dIdx = SOBEL_SCALE * _gather(dx_color, v_t, u_t)
    dIdy = SOBEL_SCALE * _gather(dy_color, v_t, u_t)

    p3d_trans = src_xyz @ R.T + t  # [H,W,3]
    X, Y, Z = p3d_trans[..., 0], p3d_trans[..., 1], p3d_trans[..., 2]
    invz = 1.0 / jnp.where(jnp.abs(Z) > 1e-8, Z, 1.0)

    c0 = dIdx * fx * invz
    c1 = dIdy * fy * invz
    c2 = -(c0 * X + c1 * Y) * invz
    J_photo = jnp.stack([
        -Z * c1 + Y * c2,
        Z * c0 - X * c2,
        -Y * c0 + X * c1,
        c0, c1, c2,
    ], -1)  # [H,W,6]

    if jac_type == "color":
        sqrt_li = 1.0
        J0 = J_photo
        r0 = diff_photo
        J1 = jnp.zeros_like(J_photo)
        r1 = jnp.zeros_like(r0)
    else:
        sqrt_ld = jnp.sqrt(jnp.float32(LAMBDA_HYBRID_DEPTH))
        sqrt_li = jnp.sqrt(jnp.float32(1.0 - LAMBDA_HYBRID_DEPTH))
        dDdx = SOBEL_SCALE * _gather(dx_depth, v_t, u_t)
        dDdy = SOBEL_SCALE * _gather(dy_depth, v_t, u_t)
        dDdx = jnp.where(jnp.isnan(dDdx), 0.0, dDdx)
        dDdy = jnp.where(jnp.isnan(dDdy), 0.0, dDdy)
        d_t = _gather(tgt_depth, v_t, u_t)
        diff_geo = d_t - Z
        d0 = dDdx * fx * invz
        d1 = dDdy * fy * invz
        d2 = -(d0 * X + d1 * Y) * invz
        J0 = sqrt_li * J_photo
        r0 = sqrt_li * diff_photo
        J1 = sqrt_ld * jnp.stack([
            (-Z * d1 + Y * d2) - Y,
            (Z * d0 - X * d2) + X,
            -Y * d0 + X * d1,
            d0, d1, d2 - 1.0,
        ], -1)
        r1 = sqrt_ld * diff_geo

    # NaN from invalid depth must be zeroed with where (0*NaN == NaN)
    J0 = jnp.where(ok[..., None], J0, 0.0)
    J1 = jnp.where(ok[..., None], J1, 0.0)
    r0 = jnp.where(ok, r0, 0.0)
    r1 = jnp.where(ok, r1, 0.0)
    w = ok.astype(jnp.float32)
    return J0, r0, J1, r1, w


def _reduce_system(J0, r0, J1, r1, w):
    """Masked JTJ/JTr/r2 over both residual rows (reference:
    ComputeJTJandJTr<...,2>, utility/eigen.inl)."""
    J0f = (J0 * w[..., None]).reshape(-1, 6)
    J1f = (J1 * w[..., None]).reshape(-1, 6)
    J0u = J0.reshape(-1, 6)
    J1u = J1.reshape(-1, 6)
    r0f = r0.reshape(-1)
    r1f = r1.reshape(-1)
    JTJ = (jnp.dot(J0f.T, J0u, precision=jax.lax.Precision.HIGHEST)
           + jnp.dot(J1f.T, J1u, precision=jax.lax.Precision.HIGHEST))
    hi = jax.lax.Precision.HIGHEST
    JTr = jnp.matmul(J0f.T, r0f, precision=hi) \
        + jnp.matmul(J1f.T, r1f, precision=hi)
    wf = w.reshape(-1)
    r2 = jnp.sum(wf * (r0f * r0f + r1f * r1f))
    return JTJ, JTr, r2


@partial(jax.jit, static_argnames=("jac_type", "n_iter"))
def level_odometry(src_color, src_depth, tgt_color, tgt_depth,
                   dx_color, dx_depth, dy_color, dy_depth,
                   K, T_init, max_depth_diff,
                   jac_type: str, n_iter: int):
    """Run ``n_iter`` GN iterations at one pyramid level.

    reference: the iter loop in ComputeMultiscale (odometry.cu:735-751)
    + DoSingleIteration (odometry.cu:585-631), fused into one
    `lax.fori_loop` on device.
    """
    src_xyz = depth_to_xyz(jnp.where(jnp.isfinite(src_depth), src_depth, 0.0), K)

    def body(_, carry):
        T, _ = carry
        u_t, v_t, z, ok = compute_correspondence(
            src_depth, tgt_depth, K, T, max_depth_diff)
        J0, r0, J1, r1, w = _jacobians(
            jac_type, src_color, src_depth, tgt_color, tgt_depth, src_xyz,
            dx_color, dx_depth, dy_color, dy_depth, K, T, u_t, v_t, ok)
        JTJ, JTr, r2 = _reduce_system(J0, r0, J1, r1, w)
        solved, delta = ueigen.solve_jacobian_system(JTJ, JTr)
        T_new = jnp.where(solved, jnp.matmul(
            delta, T, precision=jax.lax.Precision.HIGHEST), T)
        return T_new, solved

    T, ok = jax.lax.fori_loop(0, n_iter, body, (T_init, jnp.bool_(True)))
    return T, ok


@partial(jax.jit, static_argnames=("jac_type", "n_iter"))
def level_odometry_weighted(src_color, src_depth, tgt_color, tgt_depth,
                            dx_color, dx_depth, dy_color, dy_depth,
                            K, T_init, max_depth_diff, nu, sigma2_init,
                            inv_sigma_diag, prev_twist, curr_vel_init,
                            jac_type: str, n_iter: int):
    """Weighted (t-distribution) variant with twist prior.

    reference: DoSingleIterationWeighted (odometry.cu:654-707) +
    ComputeWeightedJTJandJTr (eigen.inl:153-195): per-pixel r2 ->
    w_sum = sum(r2*(nu+1)/(nu+r2/sigma2)); weights
    (nu+1)/(nu+r2/w_sum); JTJ diag += inv_sigma; JTr -=
    inv_sigma*(prev_twist - curr_vel).
    """
    from ..utility.transforms import log_se3

    src_xyz = depth_to_xyz(jnp.where(jnp.isfinite(src_depth), src_depth, 0.0), K)

    def body(_, carry):
        T, curr_vel, sigma2 = carry
        u_t, v_t, z, ok = compute_correspondence(
            src_depth, tgt_depth, K, T, max_depth_diff)
        J0, r0, J1, r1, w = _jacobians(
            jac_type, src_color, src_depth, tgt_color, tgt_depth, src_xyz,
            dx_color, dx_depth, dy_color, dy_depth, K, T, u_t, v_t, ok)
        r2 = (r0 * r0 + r1 * r1)
        w_sum = jnp.sum(w * r2 * (nu + 1.0) / (nu + r2 / sigma2))
        wt = w * (nu + 1.0) / (nu + r2 / jnp.maximum(w_sum, 1e-12))
        JTJ, JTr, _ = _reduce_system(J0, r0, J1, r1, wt)
        JTJ = JTJ + jnp.diag(inv_sigma_diag)
        cv_twist = log_se3(curr_vel)
        JTr = JTr - inv_sigma_diag * (prev_twist - cv_twist)
        solved, delta = ueigen.solve_jacobian_system(JTJ, JTr)
        hi = jax.lax.Precision.HIGHEST
        T_new = jnp.where(solved,
                          jnp.matmul(delta, T, precision=hi), T)
        curr_vel_new = jnp.where(
            solved, jnp.matmul(delta, curr_vel, precision=hi),
            curr_vel)
        return T_new, curr_vel_new, w_sum

    T, curr_vel, sigma2 = jax.lax.fori_loop(
        0, n_iter, body, (T_init, curr_vel_init, jnp.float32(sigma2_init)))
    return T, curr_vel, sigma2


@jax.jit
def information_matrix(depth_s, depth_t, K, T, max_depth_diff):
    """6x6 information matrix over the final correspondences.

    reference: CreateInformationMatrix (odometry.cu:371-395) — GTG of
    [I | -2 skew(q)]-style rows over target xyz, init identity.
    """
    u_t, v_t, z, ok = compute_correspondence(
        depth_s, depth_t, K, T, max_depth_diff)
    xyz_t = depth_to_xyz(jnp.where(jnp.isfinite(depth_t), depth_t, 0.0), K)
    q = xyz_t[v_t, u_t]  # [H,W,3]
    x, y, zt = q[..., 0], q[..., 1], q[..., 2]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    g1 = jnp.stack([zero, zt, -y, one, zero, zero], -1)
    g2 = jnp.stack([-zt, zero, x, zero, one, zero], -1)
    g3 = jnp.stack([y, -x, zero, zero, zero, one], -1)
    w = ok.astype(jnp.float32)[..., None]
    G = jnp.concatenate([(g1 * w).reshape(-1, 6), (g2 * w).reshape(-1, 6),
                         (g3 * w).reshape(-1, 6)], 0)
    Gu = jnp.concatenate([g1.reshape(-1, 6), g2.reshape(-1, 6),
                          g3.reshape(-1, 6)], 0)
    return jnp.eye(6, dtype=jnp.float32) + jnp.dot(
        G.T, Gu, precision=jax.lax.Precision.HIGHEST)


@jax.jit
def normalize_intensity_scales(color_s, color_t, depth_s, depth_t, K, T,
                               max_depth_diff):
    """Mean intensity over corresponding pixels -> per-image scale.

    reference: NormalizeIntensity (odometry.cu:416-437): scale each
    image by 0.5/mean over the correspondence set.
    """
    u_t, v_t, z, ok = compute_correspondence(
        depth_s, depth_t, K, T, max_depth_diff)
    w = ok.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    mean_s = jnp.sum(w * color_s) / cnt
    mean_t = jnp.sum(w * _gather(color_t, v_t, u_t)) / cnt
    return 0.5 / jnp.maximum(mean_s, 1e-12), 0.5 / jnp.maximum(mean_t, 1e-12)
