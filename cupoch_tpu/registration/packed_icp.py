"""Fused ICP loop over the packed candidate grid.

reference: RegistrationICP loop, registration.cu:121-173. The whole
loop compiles to ONE XLA program: per iteration, an XLA elementwise
pass pre-transforms the binned queries, the packgrid Pallas kernel
finds correspondences AND delivers the winners' target attributes
(normal / plane offset / point) in bin order, and the Gauss-Newton
system is reduced directly from those bin-order arrays — no per-
iteration gathers, scatters, or host round-trips. Queries are re-
binned (multi-operand sort) only when the accumulated rigid motion
since the last binning exceeds the grid's planned margin; the bound
used is max over the source AABB corners of |(T - T_bin) x|, exact
for rigid transforms because the displacement is affine in x.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..knn import packgrid
from ..utility.transforms import transform_points, rotate_normals
from .estimation import TransformationEstimationType, _gn_update
from .kabsch import kabsch_weighted


def _displacement_bound(T, T_bin, corners):
    """max_x in AABB |(T - T_bin) @ [x,1]| — affine in x, so the max
    over the box is attained at a corner. corners: [8, 3]."""
    D = T - T_bin
    d = corners @ D[:3, :3].T + D[:3, 3]
    return jnp.sqrt(jnp.max(jnp.sum(d * d, -1)))


def _estimator_update(est_type, q_t, qnrm_t, attr, w):
    """GN / Kabsch update from bin-order arrays.

    q_t  [K, 3]   transformed source points
    attr [K, A]   winner channels (layout depends on estimator)
    w    [K]      validity weights
    """
    if est_type == TransformationEstimationType.PointToPoint:
        p = attr[:, 0:3]
        return kabsch_weighted(q_t, p, w)
    if est_type == TransformationEstimationType.PointToPlane:
        n = attr[:, 0:3]
        d = attr[:, 3]
        r = jnp.sum(n * q_t, -1) - d
        J = jnp.concatenate([jnp.cross(q_t, n), n], -1)
        return _gn_update(J, r, w)
    if est_type == TransformationEstimationType.SymmetricMethod:
        p = attr[:, 0:3]
        nt = attr[:, 3:6]
        n = qnrm_t + nt
        r = jnp.sum((q_t - p) * n, -1)
        J = jnp.concatenate([jnp.cross(q_t + p, n), n], -1)
        return _gn_update(J, r, w)
    raise ValueError(f"unsupported estimator {est_type}")


@partial(jax.jit, static_argnames=(
    "qcap", "est_type", "max_iteration", "use_pallas"))
def icp_core_packed(
    src: jax.Array,            # [Np, 3] padded source points
    src_mask: jax.Array,       # [Np]
    src_normals: jax.Array,    # [Np, 3] (zeros unless symmetric)
    grid: packgrid.PackGrid,
    init_T: jax.Array,
    max_dist: jax.Array,
    rebin_margin: jax.Array,
    relative_fitness: jax.Array,
    relative_rmse: jax.Array,
    qcap: int,
    est_type: TransformationEstimationType,
    max_iteration: int,
    use_pallas: Optional[bool] = None,
):
    """Returns (T, idx [Np] int32, fitness, inlier_rmse, iterations)."""
    Np = src.shape[0]
    n_src = jnp.maximum(jnp.sum(src_mask), 1).astype(jnp.float32)
    need_src_normals = (
        est_type == TransformationEstimationType.SymmetricMethod)
    n_extra = 3 if need_src_normals else 0
    centers = packgrid._cell_centers(
        grid.dims, grid.origin, grid.cell_size,
        packgrid.padded_cells(grid.dims))

    # source AABB corners for the rebin displacement bound
    big = jnp.float32(1e30)
    lo = jnp.min(jnp.where(src_mask[:, None], src, big), 0)
    hi = jnp.max(jnp.where(src_mask[:, None], src, -big), 0)
    corners = jnp.stack([
        jnp.stack([lo[0] if i & 1 == 0 else hi[0],
                   lo[1] if i & 2 == 0 else hi[1],
                   lo[2] if i & 4 == 0 else hi[2]])
        for i in range(8)])

    def rebin(T):
        pos = transform_points(T, src)
        return packgrid.bin_queries(
            src, pos, grid.origin, grid.cell_size, grid.dims, qcap,
            extra=src_normals if need_src_normals else None,
            n_extra=n_extra, mask=src_mask)

    def eval_at(T, qsoa):
        q8 = packgrid.prep_queries(qsoa, T, centers)
        d2, attr = packgrid.query_packed(grid, q8, max_dist,
                                         use_pallas=use_pallas)
        return q8, d2, attr

    def stats(d2, qidx):
        valid = (qidx >= 0) & jnp.isfinite(d2)
        w = valid.astype(jnp.float32)
        cnt = jnp.sum(w)
        fit = cnt / n_src
        err = jnp.maximum(jnp.sum(jnp.where(valid, d2, 0.0)), 0.0)
        rmse = jnp.sqrt(err / jnp.maximum(cnt, 1.0))
        rmse = jnp.where(cnt > 0, rmse, 0.0)
        return w, fit, rmse

    qsoa0, qnrm0, qidx0 = rebin(init_T)
    if qnrm0 is None:
        qnrm0 = jnp.zeros((qsoa0.shape[0], 0, qcap), jnp.float32)

    def cond(state):
        it, done, *_ = state
        return (it < max_iteration) & (~done)

    def body(state):
        it, done, T, T_bin, qsoa, qnrm, qidx, fit, rmse = state
        disp = _displacement_bound(T, T_bin, corners)

        def do_rebin(_):
            qs, qn, qi = rebin(T)
            if qn is None:
                qn = jnp.zeros_like(qnrm)
            return qs, qn, qi, T

        qsoa, qnrm, qidx, T_bin = jax.lax.cond(
            disp > rebin_margin, do_rebin,
            lambda _: (qsoa, qnrm, qidx, T_bin), None)

        q8, d2, attr = eval_at(T, qsoa)
        w2d, fit2, rmse2 = stats(d2, qidx)
        converged = (jnp.abs(fit - fit2) < relative_fitness) & (
            jnp.abs(rmse - rmse2) < relative_rmse) & (it > 0)

        K = q8.shape[0] * qcap
        q_t = jnp.moveaxis(q8[:, 0:3, :], 1, 2).reshape(K, 3)
        attr_f = jnp.moveaxis(attr, 1, 2).reshape(K, -1)
        if need_src_normals:
            qn_t = rotate_normals(
                T, jnp.moveaxis(qnrm, 1, 2).reshape(K, 3))
        else:
            qn_t = None
        U = _estimator_update(est_type, q_t, qn_t, attr_f,
                              w2d.reshape(K))
        T_new = jnp.where(converged, T, U @ T)
        return (it + 1, converged, T_new, T_bin, qsoa, qnrm, qidx,
                fit2, rmse2)

    state0 = (jnp.int32(0), jnp.bool_(False),
              init_T.astype(jnp.float32), init_T.astype(jnp.float32),
              qsoa0, qnrm0, qidx0, jnp.float32(-1.0), jnp.float32(-1.0))
    it, _, T, T_bin, qsoa, qnrm, qidx, _, _ = jax.lax.while_loop(
        cond, body, state0)

    # final evaluation at the returned transform (matches the
    # reference: result metrics always correspond to the returned T)
    disp = _displacement_bound(T, T_bin, corners)

    def do_rebin(_):
        qs, qn, qi = rebin(T)
        if qn is None:
            qn = jnp.zeros_like(qnrm)
        return qs, qi

    qsoa, qidx = jax.lax.cond(
        disp > rebin_margin, do_rebin, lambda _: (qsoa, qidx), None)
    _, d2, attr = eval_at(T, qsoa)
    _, fit, rmse = stats(d2, qidx)

    # scatter correspondence indices back to source order
    win = -attr[:, grid.nch, :]  # negated index channel
    ok = jnp.isfinite(d2) & (qidx >= 0)
    idx_bin = jnp.where(ok, win, float(packgrid.INVALID_INDEX)) \
        .astype(jnp.int32)
    flat_q = qidx.reshape(-1)
    okq = flat_q >= 0
    slot = jnp.where(okq, flat_q, Np)
    idx_src = jnp.full((Np + 1,), packgrid.INVALID_INDEX, jnp.int32) \
        .at[slot].set(jnp.where(okq, idx_bin.reshape(-1),
                                packgrid.INVALID_INDEX),
                      mode="drop")[:Np]
    return T, idx_src, fit, rmse, it


def make_target_attrs(est_type, tgt_pts, tgt_normals):
    """Per-target attribute channels for the packed kernel."""
    if est_type == TransformationEstimationType.PointToPoint:
        return tgt_pts, 3
    if est_type == TransformationEstimationType.PointToPlane:
        d = jnp.sum(tgt_normals * tgt_pts, -1, keepdims=True)
        return jnp.concatenate([tgt_normals, d], -1), 4
    if est_type == TransformationEstimationType.SymmetricMethod:
        return jnp.concatenate([tgt_pts, tgt_normals], -1), 6
    raise ValueError(f"unsupported estimator {est_type}")
