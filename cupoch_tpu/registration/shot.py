"""SHOT descriptor (352-dim)
(reference: src/cupoch/registration/shot.cu:39-222).

TPU-native layout: the per-point CUDA thread with serial neighbor loop
and 5 scattered histogram writes becomes one fused program over
[N, k] neighbor arrays — every neighbor emits a fixed set of
(bin, weight) pairs which are accumulated per point with a vmapped
scatter-add. The local reference frame is a weighted 3x3 eigendecomp
(symeig3x3) with majority-vote sign disambiguation, all batched.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..knn import KDTreeSearchParam, KDTreeSearchParamRadius, search_neighbors
from ..utility import console
from ..utility import eigen as ueigen
from .feature import Feature

_RAD_45 = math.pi / 4.0
_RAD_90 = math.pi / 2.0
_RAD_135 = 3.0 * math.pi / 4.0
_RAD_PI_7_8 = 7.0 * math.pi / 8.0

_N_BINS = 10
_MIN_NEIGHBORS = 5
_MAX_SECTORS = 32
_DIM = _MAX_SECTORS * (_N_BINS + 1)  # 352


def _lrf(points, nbr_idx, nbr_d2, radius):
    """Batched local reference frames (compute_shot_lrf,
    shot.cu:63-99): weighted covariance -> (x, y, z) axes with
    majority-vote sign flips."""
    N, k = nbr_idx.shape
    self_idx = jnp.arange(N)[:, None]
    valid = (nbr_idx >= 0) & (nbr_idx != self_idx)
    idx = jnp.clip(nbr_idx, 0, N - 1)
    q = points[idx] - points[:, None, :]  # [N, k, 3]
    w = jnp.where(valid, radius - jnp.sqrt(jnp.maximum(nbr_d2, 0.0)), 0.0)
    cov = jnp.einsum("nk,nki,nkj->nij", w, q, q)
    w_total = jnp.sum(w, -1)
    cov = cov / jnp.maximum(w_total, 1e-30)[:, None, None]
    _, vecs = ueigen.symeig3x3(cov)  # ascending eigenvalues
    zaxis = vecs[..., :, 0]  # min-eigenvalue direction
    xaxis = vecs[..., :, 2]  # max-eigenvalue direction
    n_nb = jnp.sum(valid, -1)
    n_px = jnp.sum(valid & (jnp.einsum("nki,ni->nk", q, xaxis) >= 0), -1)
    n_pz = jnp.sum(valid & (jnp.einsum("nki,ni->nk", q, zaxis) >= 0), -1)
    xaxis = jnp.where((n_px < n_nb - n_px)[:, None], -xaxis, xaxis)
    zaxis = jnp.where((n_pz < n_nb - n_pz)[:, None], -zaxis, zaxis)
    yaxis = jnp.cross(zaxis, xaxis)
    return xaxis, yaxis, zaxis, n_nb, valid, q


@jax.jit
def _shot_kernel(points, normals, nbr_idx, nbr_d2, radius):
    """Full SHOT histogram (compute_shot_functor operator(),
    shot.cu:101-219)."""
    N, k = nbr_idx.shape
    r12, r34, r14 = radius * 0.5, radius * 0.75, radius * 0.25
    xaxis, yaxis, zaxis, n_nb, valid, q = _lrf(points, nbr_idx, nbr_d2,
                                               radius)
    dist = jnp.sqrt(jnp.maximum(nbr_d2, 0.0))
    valid = valid & (dist > 0)

    cos_desc = jnp.clip(jnp.einsum("ni,ni->n", zaxis, normals), -1.0, 1.0)
    bindist0 = (1.0 + cos_desc) * _N_BINS / 2.0  # [N]

    x_lrf = jnp.einsum("nki,ni->nk", q, xaxis)
    y_lrf = jnp.einsum("nki,ni->nk", q, yaxis)
    z_lrf = jnp.einsum("nki,ni->nk", q, zaxis)
    x_lrf = jnp.where(jnp.abs(x_lrf) < 1e-30, 0.0, x_lrf)
    y_lrf = jnp.where(jnp.abs(y_lrf) < 1e-30, 0.0, y_lrf)
    z_lrf = jnp.where(jnp.abs(z_lrf) < 1e-30, 0.0, z_lrf)

    bit4 = ((y_lrf > 0) | ((y_lrf == 0.0) & (x_lrf < 0))).astype(jnp.int32)
    bit3_cond = (x_lrf > 0) | ((x_lrf == 0.0) & (y_lrf > 0))
    bit3 = jnp.where(bit3_cond, 1 - bit4, bit4)
    desc = ((bit4 << 3) + (bit3 << 2)) << 1
    quad = jnp.where((x_lrf * y_lrf > 0) | (x_lrf == 0.0),
                     jnp.where(jnp.abs(x_lrf) >= jnp.abs(y_lrf), 0, 4),
                     jnp.where(jnp.abs(x_lrf) > jnp.abs(y_lrf), 4, 0))
    desc = desc + quad + (z_lrf > 0).astype(jnp.int32)
    outer = dist > r12
    desc = desc + jnp.where(outer, 2, 0)  # [N, k]

    bindist = jnp.broadcast_to(bindist0[:, None], (N, k))
    step = jnp.where(bindist < 0.0, jnp.ceil(bindist - 0.5),
                     jnp.floor(bindist + 0.5)).astype(jnp.int32)
    volume = desc * (_N_BINS + 1)
    bd = bindist - step
    init_w = 1.0 - jnp.abs(bd)

    # (1) cosine interpolation into adjacent bin
    cos_bin = jnp.where(bd > 0, (step + 1) % _N_BINS,
                        (step - 1 + _N_BINS) % _N_BINS)
    cos_idx = volume + cos_bin
    cos_w = jnp.abs(bd)

    # (2) radius interpolation into the adjacent husk
    rd_out = (dist - r34) / r12
    rd_in = (dist - r14) / r12
    init_w = init_w + jnp.where(
        outer,
        jnp.where(dist > r34, 1.0 - rd_out, 1.0 + rd_out),
        jnp.where(dist < r14, 1.0 + rd_in, 1.0 - rd_in))
    rad_active = jnp.where(outer, dist <= r34, dist >= r14)
    rad_idx = jnp.where(outer, (desc - 2) * (_N_BINS + 1) + step,
                        (desc + 2) * (_N_BINS + 1) + step)
    rad_w = jnp.where(outer, -rd_out, rd_in)
    rad_w = jnp.where(rad_active, rad_w, 0.0)

    # (3) inclination interpolation into adjacent vertical volume
    incl_cos = jnp.clip(z_lrf / jnp.maximum(dist, 1e-30), -1.0, 1.0)
    incl = jnp.arccos(incl_cos)
    lower = (incl > _RAD_90) | ((jnp.abs(incl - _RAD_90) < 1e-30)
                                & (z_lrf <= 0))
    id_lo = (incl - _RAD_135) / _RAD_90
    id_hi = (incl - _RAD_45) / _RAD_90
    init_w = init_w + jnp.where(
        lower,
        jnp.where(incl > _RAD_135, 1.0 - id_lo, 1.0 + id_lo),
        jnp.where(incl < _RAD_45, 1.0 + id_hi, 1.0 - id_hi))
    incl_active = jnp.where(lower, incl <= _RAD_135, incl >= _RAD_45)
    incl_idx = jnp.where(lower, (desc + 1) * (_N_BINS + 1) + step,
                         (desc - 1) * (_N_BINS + 1) + step)
    incl_w = jnp.where(lower, -id_lo, id_hi)
    incl_w = jnp.where(incl_active, incl_w, 0.0)

    # (4) azimuth interpolation into adjacent horizontal volume
    az_ok = (y_lrf != 0.0) | (x_lrf != 0.0)
    azimuth = jnp.arctan2(y_lrf, x_lrf)
    sel = desc >> 2
    az_dist = (azimuth - (-_RAD_PI_7_8 + _RAD_45 * sel)) / _RAD_45
    az_dist = jnp.clip(az_dist, -0.5, 0.5)
    init_w = init_w + jnp.where(az_ok, 1.0 - jnp.abs(az_dist), 0.0)
    az_idx = jnp.where(az_dist > 0, (desc + 4) % _MAX_SECTORS,
                       (desc - 4 + _MAX_SECTORS) % _MAX_SECTORS) \
        * (_N_BINS + 1) + step
    az_w = jnp.where(az_ok, jnp.abs(az_dist), 0.0)

    main_idx = volume + step

    all_idx = jnp.stack([main_idx, cos_idx, rad_idx, incl_idx, az_idx], -1)
    all_w = jnp.stack([init_w, cos_w, rad_w, incl_w, az_w], -1)
    all_w = jnp.where(valid[..., None], all_w, 0.0)
    all_idx = jnp.clip(all_idx, 0, _DIM - 1)

    def scatter_one(idxs, ws):
        return jnp.zeros(_DIM, jnp.float32).at[idxs.reshape(-1)].add(
            ws.reshape(-1))

    ft = jax.vmap(scatter_one)(all_idx, all_w)  # [N, 352]
    ft = jnp.where((n_nb >= _MIN_NEIGHBORS)[:, None], ft, 0.0)
    nrm = jnp.linalg.norm(ft, axis=-1, keepdims=True)
    return jnp.where(nrm > 0, ft / jnp.maximum(nrm, 1e-30), ft)


def compute_shot_feature(input, radius: float,
                         search_param: KDTreeSearchParam = None) -> Feature:
    """reference: ComputeSHOTFeature (shot.cu:224-257)."""
    if not input.has_normals():
        console.log_error(
            "[ComputeSHOTFeature] Failed because input point cloud has no "
            "normal.")
    search_param = search_param or KDTreeSearchParamRadius(radius)
    points = jnp.asarray(input.points, jnp.float32)
    normals = jnp.asarray(input.normals, jnp.float32)
    idx, d2 = search_neighbors(points, points, search_param)
    data = _shot_kernel(points, normals, idx, d2, jnp.float32(radius))
    return Feature(data.T)  # Feature stores [dim, num]
