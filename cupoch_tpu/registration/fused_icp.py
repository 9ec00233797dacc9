"""Fully-fused ICP loop over the run-structured grid.

reference: RegistrationICP loop, registration.cu:121-173.  The whole
loop compiles to ONE XLA program; each iteration is a single Pallas
pass (knn/rungrid.py) that finds correspondences AND reduces the
Gauss-Newton normal equations to 32 floats per tile, followed by a
6x6 on-device solve.  Queries are re-binned (one sort) only when the
accumulated rigid motion since the last binning exceeds the grid's
planned margin; the bound used is max over the source AABB corners of
|(T - T_bin) x|, exact for rigid transforms because the displacement
is affine in x.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..knn import poolgrid, rungrid
from ..utility import eigen as ueigen
from ..utility.transforms import make_transform, transform_points
from .estimation import TransformationEstimationType


def _displacement_bound(T, T_bin, corners):
    """max_x in AABB |(T - T_bin) @ [x,1]| — affine in x, so the max
    over the box is attained at a corner. corners: [8, 3]."""
    D = T - T_bin
    d = jnp.matmul(corners, D[:3, :3].T,
                   precision=jax.lax.Precision.HIGHEST) + D[:3, 3]
    return jnp.sqrt(jnp.max(jnp.sum(d * d, -1)))


def _aabb_corners(src, src_mask, axis_name=None):
    big = jnp.float32(1e30)
    lo = jnp.min(jnp.where(src_mask[:, None], src, big), 0)
    hi = jnp.max(jnp.where(src_mask[:, None], src, -big), 0)
    if axis_name is not None:
        lo = jax.lax.pmin(lo, axis_name)
        hi = jax.lax.pmax(hi, axis_name)
    return jnp.stack([
        jnp.stack([jnp.where(i & 1, hi[0], lo[0]),
                   jnp.where(i & 2, hi[1], lo[1]),
                   jnp.where(i & 4, hi[2], lo[2])])
        for i in range(8)])


def _est_code(est_type: TransformationEstimationType) -> int:
    return {
        TransformationEstimationType.PointToPoint: rungrid.EST_PT2PT,
        TransformationEstimationType.PointToPlane: rungrid.EST_PT2PL,
        TransformationEstimationType.SymmetricMethod: rungrid.EST_SYM,
        TransformationEstimationType.ColoredICP: poolgrid.EST_COLORED,
        TransformationEstimationType.GeneralizedICP: poolgrid.EST_GICP,
    }[est_type]


def make_target_attrs(est_type, tgt_pts, tgt_normals, tgt_aux=None):
    """Per-target attribute channels for the grid build (target point
    coordinates ride in the grid's own candidate channels); returns
    (attrs, est_code for the est-aware build/kernels).

    tgt_aux: ColoredICP — dict with "intensity" [M] and "gradient"
    [M, 3]; GeneralizedICP — dict with "cov" [M, 3, 3]."""
    est = _est_code(est_type)
    if est_type == TransformationEstimationType.PointToPoint:
        return jnp.zeros((tgt_pts.shape[0], 0), jnp.float32), est
    if est_type == TransformationEstimationType.PointToPlane:
        d = jnp.sum(tgt_normals * tgt_pts, -1, keepdims=True)
        return jnp.concatenate([tgt_normals, d], -1), est
    if est_type == TransformationEstimationType.SymmetricMethod:
        return tgt_normals, est
    if est_type == TransformationEstimationType.ColoredICP:
        return jnp.concatenate([
            tgt_normals, tgt_aux["intensity"][:, None],
            tgt_aux["gradient"]], -1), est
    if est_type == TransformationEstimationType.GeneralizedICP:
        return cov_upper6(tgt_aux["cov"]), est
    raise ValueError(f"unsupported estimator {est_type}")


def cov_upper6(cov):
    """[N, 3, 3] symmetric -> [N, 6] upper triangle (c00, c01, c02,
    c11, c12, c22)."""
    return jnp.stack([cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
                      cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]], -1)


def kabsch_from_sums(sums) -> jax.Array:
    """Weighted Kabsch update from the kernel's sufficient statistics
    (slot layout: rungrid N_SUMS comment).  Mirrors
    kabsch.kabsch_weighted but over precomputed reductions."""
    cnt = jnp.maximum(sums[0], 1e-12)
    t_mean = sums[1:4] / cnt
    p_mean = sums[4:7] / cnt
    Stp = sums[7:16].reshape(3, 3)
    H = Stp / cnt - jnp.outer(t_mean, p_mean)
    U, S, Vt = jnp.linalg.svd(H)
    V = Vt.T
    hi = jax.lax.Precision.HIGHEST
    det = jnp.linalg.det(jnp.matmul(V, U.T, precision=hi))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], jnp.float32)).at[2, 2].set(det)
    R = jnp.matmul(jnp.matmul(V, D, precision=hi), U.T, precision=hi)
    t = p_mean - jnp.matmul(R, t_mean, precision=hi)
    T = make_transform(R, t)
    ok = (sums[0] >= 3) & jnp.all(jnp.isfinite(T))
    return jnp.where(ok, T, jnp.eye(4, dtype=jnp.float32))


def gn_from_sums(sums) -> jax.Array:
    """6-DoF GN update from the kernel's JTJ/JTr partial sums."""
    iu = jnp.asarray(np.triu_indices(6))
    JTJ = jnp.zeros((6, 6), jnp.float32).at[iu[0], iu[1]].set(sums[:21])
    JTJ = JTJ + jnp.triu(JTJ, 1).T
    JTr = sums[21:27]
    ok, T = ueigen.solve_jacobian_system(JTJ, JTr)
    return T


def _update_from_sums(est_type, sums):
    if est_type == TransformationEstimationType.PointToPoint:
        return kabsch_from_sums(sums)
    return gn_from_sums(sums)


def _stats_from_sums(est_type, sums, n_src):
    if est_type == TransformationEstimationType.PointToPoint:
        cnt, err = sums[0], sums[16]
    else:
        cnt, err = sums[27], sums[28]
    fit = cnt / n_src
    rmse = jnp.sqrt(err / jnp.maximum(cnt, 1.0))
    rmse = jnp.where(cnt > 0, rmse, 0.0)
    return fit, rmse


@partial(jax.jit, static_argnames=(
    "qcap", "est_type", "max_iteration", "use_pallas", "axis_name"))
def icp_core_rungrid(
    src: jax.Array,            # [Np, 3] padded source points
    src_mask: jax.Array,       # [Np]
    src_normals: jax.Array,    # [Np, 3] (used by symmetric only)
    grid: rungrid.RunGrid,
    init_T: jax.Array,
    max_dist: jax.Array,
    rebin_margin: jax.Array,
    relative_fitness: jax.Array,
    relative_rmse: jax.Array,
    qcap: int,
    est_type: TransformationEstimationType,
    max_iteration: int,
    use_pallas: Optional[bool] = None,
    axis_name: Optional[str] = None,
):
    """Returns (T, idx [Np] int32, fitness, inlier_rmse, iterations).

    With `axis_name` set, runs as the per-shard body of a
    `shard_map` over a 1-D device mesh: `src`/`src_mask`/`src_normals`
    are the local query shard, the grid is replicated, and the GN
    normal equations, fitness statistics and AABB rebin bound are
    reduced with psum/pmin/pmax so every device applies the identical
    pose update — the multi-chip scaling path mandated by BASELINE.md
    (new scope vs the single-GPU reference, SURVEY.md §2.13)."""
    Np = src.shape[0]
    est = _est_code(est_type)
    n_src = jnp.sum(src_mask).astype(jnp.float32)
    if axis_name is not None:
        n_src = jax.lax.psum(n_src, axis_name)
    n_src = jnp.maximum(n_src, 1.0)
    need_src_normals = (
        est_type == TransformationEstimationType.SymmetricMethod)
    n_extra = 3 if need_src_normals else 0
    corners = _aabb_corners(src, src_mask, axis_name)
    r2 = jnp.asarray(max_dist, jnp.float32) ** 2

    def rebin(T):
        pos = transform_points(T, src)
        return rungrid.bin_queries(
            src, pos, grid.origin, grid.cell_size, grid.dims, qcap,
            extra=src_normals if need_src_normals else None,
            n_extra=n_extra, mask=src_mask)

    def gn_pass(T, qsoa, qidx):
        params = rungrid.make_params(T, r2, grid)
        partial_sums = rungrid.fused_query(
            grid, qsoa, qidx, params, est, False, use_pallas=use_pallas)
        sums = jnp.sum(partial_sums, 0)
        if axis_name is not None:
            sums = jax.lax.psum(sums, axis_name)
        return sums

    qsoa0, qidx0 = rebin(init_T)

    def cond(state):
        it, done, *_ = state
        return (it < max_iteration) & (~done)

    def body(state):
        it, done, T, T_bin, qsoa, qidx, fit, rmse = state
        disp = _displacement_bound(T, T_bin, corners)
        qsoa, qidx, T_bin = jax.lax.cond(
            disp > rebin_margin,
            lambda _: rebin(T) + (T,),
            lambda _: (qsoa, qidx, T_bin), None)
        sums = gn_pass(T, qsoa, qidx)
        fit2, rmse2 = _stats_from_sums(est_type, sums, n_src)
        converged = (jnp.abs(fit - fit2) < relative_fitness) & (
            jnp.abs(rmse - rmse2) < relative_rmse) & (it > 0)
        U = _update_from_sums(est_type, sums)
        T_new = jnp.where(converged, T, jnp.matmul(
            U, T, precision=jax.lax.Precision.HIGHEST))
        return (it + 1, converged, T_new, T_bin, qsoa, qidx,
                fit2, rmse2)

    state0 = (jnp.int32(0), jnp.bool_(False),
              init_T.astype(jnp.float32), init_T.astype(jnp.float32),
              qsoa0, qidx0, jnp.float32(-1.0), jnp.float32(-1.0))
    it, _, T, T_bin, qsoa, qidx, _, _ = jax.lax.while_loop(
        cond, body, state0)

    # final evaluation at the returned transform (matches the
    # reference: result metrics always correspond to the returned T)
    disp = _displacement_bound(T, T_bin, corners)
    qsoa, qidx = jax.lax.cond(
        disp > rebin_margin, lambda _: rebin(T),
        lambda _: (qsoa, qidx), None)
    params = rungrid.make_params(T, r2, grid)
    d2, nidx = rungrid.fused_query(grid, qsoa, qidx, params,
                                   rungrid.EST_NONE, True,
                                   use_pallas=use_pallas)
    ok = jnp.isfinite(d2) & (qidx >= 0)
    w = ok.astype(jnp.float32)
    cnt = jnp.sum(w)
    err = jnp.sum(jnp.where(ok, d2, 0.0))
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
        err = jax.lax.psum(err, axis_name)
    fit = cnt / n_src
    rmse = jnp.sqrt(err / jnp.maximum(cnt, 1.0))
    rmse = jnp.where(cnt > 0, rmse, 0.0)

    # scatter correspondence indices back to source order
    idx_bin = jnp.where(ok, -nidx, float(rungrid.INVALID_INDEX)) \
        .astype(jnp.int32)
    flat_q = qidx.reshape(-1)
    okq = flat_q >= 0
    slot = jnp.where(okq, flat_q, Np)
    idx_src = jnp.full((Np + 1,), rungrid.INVALID_INDEX, jnp.int32) \
        .at[slot].set(jnp.where(okq, idx_bin.reshape(-1),
                                rungrid.INVALID_INDEX),
                      mode="drop")[:Np]
    return T, idx_src, fit, rmse, it


@partial(jax.jit, static_argnames=(
    "qp", "est_type", "max_iteration", "use_pallas", "axis_name"))
def icp_core_pool(
    src: jax.Array,            # [Np, 3] padded source points
    src_mask: jax.Array,       # [Np]
    src_aux: jax.Array,        # [Np, E] est extras (sym: normals;
                               # colored: intensity; gicp: cov6)
    grid: poolgrid.PoolGrid,
    init_T: jax.Array,
    max_dist: jax.Array,
    rebin_margin: jax.Array,
    relative_fitness: jax.Array,
    relative_rmse: jax.Array,
    qp: int,
    est_type: TransformationEstimationType,
    max_iteration: int,
    use_pallas: Optional[bool] = None,
    axis_name: Optional[str] = None,
    extra_params=(0.0, 0.0),
):
    """Pooled-grid fused ICP loop (knn/poolgrid.py): the round-4 fast
    path. Same contract as `icp_core_rungrid`; per iteration one
    Pallas pass does MXU-scored correspondence + in-kernel GN
    reduction over tile-pooled queries. All five estimators ride this
    path (reference: colored_icp.cu:150-216, generalized_icp.cu:64-106
    for the two that fall back to gathers in the reference's design).
    Returns (T, idx [Np] int32, fitness, inlier_rmse, iterations)."""
    Np = src.shape[0]
    est = _est_code(est_type)
    n_src = jnp.sum(src_mask).astype(jnp.float32)
    if axis_name is not None:
        n_src = jax.lax.psum(n_src, axis_name)
    n_src = jnp.maximum(n_src, 1.0)
    n_extra = poolgrid.n_query_extra(est)
    corners = _aabb_corners(src, src_mask, axis_name)
    r2 = jnp.asarray(max_dist, jnp.float32) ** 2
    e0 = jnp.asarray(extra_params[0], jnp.float32)
    e1 = jnp.asarray(extra_params[1], jnp.float32)

    def rebin_full(T):
        return poolgrid.bin_queries_pool(
            src, T, grid.origin, grid.cell_size, grid.dims, qp,
            grid.tile, extra=src_aux, n_extra=n_extra, mask=src_mask,
            cell_map=grid.cell_map,
            n_rank_pad=grid.n_tiles * grid.tile)

    def gn_pass(T, qpool):
        params = poolgrid.make_params(T, r2, grid, e0, e1)
        partial_sums = poolgrid.fused_pool_query(
            grid, qpool, params, est, False, use_pallas=use_pallas)
        sums = jnp.sum(partial_sums, 0)
        if axis_name is not None:
            sums = jax.lax.psum(sums, axis_name)
        return sums

    qpool0, qidx0, nq0 = rebin_full(init_T)

    def cond(state):
        it, done, *_ = state
        return (it < max_iteration) & (~done)

    def body(state):
        it, done, T, T_bin, qpool, qidx, fit, rmse, nq = state
        disp = _displacement_bound(T, T_bin, corners)
        # every rebin's drop count feeds the running max: the
        # loud-degradation diagnostic must see drops from LATER
        # rebins after the transform drifts, not just the first
        qpool, qidx, nq2, T_bin = jax.lax.cond(
            disp > rebin_margin,
            lambda _: rebin_full(T) + (T,),
            lambda _: (qpool, qidx, jnp.int32(0), T_bin), None)
        nq = jnp.maximum(nq, nq2)
        sums = gn_pass(T, qpool)
        fit2, rmse2 = _stats_from_sums(est_type, sums, n_src)
        converged = (jnp.abs(fit - fit2) < relative_fitness) & (
            jnp.abs(rmse - rmse2) < relative_rmse) & (it > 0)
        U = _update_from_sums(est_type, sums)
        T_new = jnp.where(converged, T, jnp.matmul(
            U, T, precision=jax.lax.Precision.HIGHEST))
        return (it + 1, converged, T_new, T_bin, qpool, qidx,
                fit2, rmse2, nq)

    state0 = (jnp.int32(0), jnp.bool_(False),
              init_T.astype(jnp.float32), init_T.astype(jnp.float32),
              qpool0, qidx0, jnp.float32(-1.0), jnp.float32(-1.0),
              nq0)
    it, _, T, T_bin, qpool, qidx, _, _, nq_dropped = \
        jax.lax.while_loop(cond, body, state0)

    # final evaluation at the returned transform (matches the
    # reference: result metrics always correspond to the returned T)
    disp = _displacement_bound(T, T_bin, corners)
    qpool, qidx, nqf = jax.lax.cond(
        disp > rebin_margin, lambda _: rebin_full(T),
        lambda _: (qpool, qidx, jnp.int32(0)), None)
    nq_dropped = jnp.maximum(nq_dropped, nqf)
    params = poolgrid.make_params(T, r2, grid)
    d2, idxf = poolgrid.fused_pool_query(grid, qpool, params, est,
                                         True, use_pallas=use_pallas)
    ok = jnp.isfinite(d2) & (qidx >= 0)
    w = ok.astype(jnp.float32)
    cnt = jnp.sum(w)
    err = jnp.sum(jnp.where(ok, d2, 0.0))
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
        err = jax.lax.psum(err, axis_name)
    fit = cnt / n_src
    rmse = jnp.sqrt(err / jnp.maximum(cnt, 1.0))
    rmse = jnp.where(cnt > 0, rmse, 0.0)

    idx_bin = jnp.where(ok, idxf, float(rungrid.INVALID_INDEX)) \
        .astype(jnp.int32)
    flat_q = qidx.reshape(-1)
    okq = flat_q >= 0
    slot = jnp.where(okq, flat_q, Np)
    idx_src = jnp.full((Np + 1,), rungrid.INVALID_INDEX, jnp.int32) \
        .at[slot].set(jnp.where(okq, idx_bin.reshape(-1),
                                rungrid.INVALID_INDEX),
                      mode="drop")[:Np]
    return T, idx_src, fit, rmse, it, nq_dropped


@partial(jax.jit, static_argnames=(
    "qp", "est_type", "max_iteration", "n_shards", "use_pallas",
    "axis_name"))
def icp_core_pool_ring(
    src: jax.Array,            # [Nd, 3] THIS device's source shard
    src_mask: jax.Array,       # [Nd]
    src_aux: jax.Array,        # [Nd, E] est extras
    grid: poolgrid.PoolGrid,   # scan = THIS device's shard;
                               # binfields replicated (global)
    init_T: jax.Array,
    max_dist: jax.Array,
    rebin_margin: jax.Array,
    relative_fitness: jax.Array,
    relative_rmse: jax.Array,
    qp: int,
    est_type: TransformationEstimationType,
    max_iteration: int,
    n_shards: int,
    use_pallas: Optional[bool] = None,
    axis_name: str = "points",
    extra_params=(0.0, 0.0),
):
    """CELL-SHARDED multi-chip fused ICP (VERDICT r3 item 5): the
    target grid's heavy score table is sharded by supertile across the
    mesh instead of replicated, so map-scale targets are bounded by
    TOTAL HBM, not one device's. Queries stay where they were loaded;
    each GN pass runs D ring rounds — score my queries against the
    grid shard I currently hold, then `ppermute` the shard one step
    around the ring (ICI neighbor traffic only, no all-gather). After
    D rounds every shard has visited every device and the 29 GN floats
    are `psum`'d as in the replicated path.

    Only scan rotates (the dominant grid bytes at bench shapes);
    the epilogue's compact binfields table stays replicated.
    Returns (T, idx [Nd] int32 local, fitness, rmse, iterations,
    n_dropped_queries [psum over devices, max over rebins])."""
    D = n_shards
    Np = src.shape[0]
    est = _est_code(est_type)
    n_src = jnp.sum(src_mask).astype(jnp.float32)
    n_src = jnp.maximum(jax.lax.psum(n_src, axis_name), 1.0)
    n_extra = poolgrid.n_query_extra(est)
    corners = _aabb_corners(src, src_mask, axis_name)
    r2 = jnp.asarray(max_dist, jnp.float32) ** 2
    e0 = jnp.asarray(extra_params[0], jnp.float32)
    e1 = jnp.asarray(extra_params[1], jnp.float32)
    Gd = grid.n_tiles          # local supertiles per shard
    my = jax.lax.axis_index(axis_name).astype(jnp.int32)
    perm = [(i, (i + 1) % D) for i in range(D)]

    def local_grid(scan_sh, scan_lo_sh=None):
        if scan_lo_sh is None:
            scan_lo_sh = jnp.zeros_like(scan_sh)
        return poolgrid.PoolGrid(
            scan_sh, scan_lo_sh, grid.binfields, grid.origin,
            grid.cell_size, grid.off, grid.dims, grid.cap, grid.kc,
            grid.est, grid.tile)

    def rebin_full(T):
        return poolgrid.bin_queries_pool(
            src, T, grid.origin, grid.cell_size, grid.dims, qp,
            grid.tile, extra=src_aux, n_extra=n_extra, mask=src_mask,
            shards=D, cell_map=grid.cell_map,
            n_rank_pad=grid.n_tiles * D * grid.tile)

    def ring_gn(T, qpool):
        params = poolgrid.make_params(T, r2, grid, e0, e1)
        CH, QP = qpool.shape[1], qpool.shape[2]
        qb = qpool.reshape(D, Gd, CH, QP)

        def body(r, carry):
            scan_sh, sid, acc = carry
            block = jax.lax.dynamic_index_in_dim(qb, sid, 0,
                                                 keepdims=False)
            sums = poolgrid.fused_pool_query(
                local_grid(scan_sh), block, params, est, False,
                use_pallas=use_pallas, tile0=sid * Gd)
            acc = acc + sums[0]
            scan_sh = jax.lax.ppermute(scan_sh, axis_name, perm)
            return scan_sh, (sid - 1) % D, acc

        *_, acc = jax.lax.fori_loop(
            0, D, body,
            (grid.scan, my,
             jnp.zeros((rungrid.N_SUMS,), jnp.float32)))
        return jax.lax.psum(acc, axis_name)

    def ring_corres(T, qpool):
        params = poolgrid.make_params(T, r2, grid)
        CH, QP = qpool.shape[1], qpool.shape[2]
        qb = qpool.reshape(D, Gd, CH, QP)
        d2b = jnp.full((D, Gd, QP), jnp.inf, jnp.float32)
        ixb = jnp.full((D, Gd, QP), float(rungrid.INVALID_INDEX),
                       jnp.float32)

        def body(r, carry):
            scan_sh, lo_sh, sid, d2b, ixb = carry
            block = jax.lax.dynamic_index_in_dim(qb, sid, 0,
                                                 keepdims=False)
            d2, ix = poolgrid.fused_pool_query(
                local_grid(scan_sh, lo_sh),
                block, params, est, True,
                use_pallas=use_pallas, tile0=sid * Gd)
            d2b = jax.lax.dynamic_update_index_in_dim(d2b, d2, sid, 0)
            ixb = jax.lax.dynamic_update_index_in_dim(ixb, ix, sid, 0)
            scan_sh = jax.lax.ppermute(scan_sh, axis_name, perm)
            lo_sh = jax.lax.ppermute(lo_sh, axis_name, perm)
            return scan_sh, lo_sh, (sid - 1) % D, d2b, ixb

        *_, d2b, ixb = jax.lax.fori_loop(
            0, D, body, (grid.scan, grid.scan_lo, my, d2b, ixb))
        return d2b.reshape(D * Gd, QP), ixb.reshape(D * Gd, QP)

    qpool0, qidx0, nq0 = rebin_full(init_T)

    def cond(state):
        it, done, *_ = state
        return (it < max_iteration) & (~done)

    def body(state):
        it, done, T, T_bin, qpool, qidx, fit, rmse, nq = state
        disp = _displacement_bound(T, T_bin, corners)
        qpool, qidx, nq2, T_bin = jax.lax.cond(
            disp > rebin_margin,
            lambda _: rebin_full(T) + (T,),
            lambda _: (qpool, qidx, jnp.int32(0), T_bin), None)
        nq = jnp.maximum(nq, nq2)
        sums = ring_gn(T, qpool)
        fit2, rmse2 = _stats_from_sums(est_type, sums, n_src)
        converged = (jnp.abs(fit - fit2) < relative_fitness) & (
            jnp.abs(rmse - rmse2) < relative_rmse) & (it > 0)
        U = _update_from_sums(est_type, sums)
        T_new = jnp.where(converged, T, jnp.matmul(
            U, T, precision=jax.lax.Precision.HIGHEST))
        return (it + 1, converged, T_new, T_bin, qpool, qidx,
                fit2, rmse2, nq)

    state0 = (jnp.int32(0), jnp.bool_(False),
              init_T.astype(jnp.float32), init_T.astype(jnp.float32),
              qpool0, qidx0, jnp.float32(-1.0), jnp.float32(-1.0),
              nq0)
    it, _, T, T_bin, qpool, qidx, _, _, nq_dropped = \
        jax.lax.while_loop(cond, body, state0)

    disp = _displacement_bound(T, T_bin, corners)
    qpool, qidx, nqf = jax.lax.cond(
        disp > rebin_margin, lambda _: rebin_full(T),
        lambda _: (qpool, qidx, jnp.int32(0)), None)
    nq_dropped = jax.lax.psum(
        jnp.maximum(nq_dropped, nqf), axis_name)
    d2, idxf = ring_corres(T, qpool)
    ok = jnp.isfinite(d2) & (qidx >= 0)
    w = ok.astype(jnp.float32)
    cnt = jax.lax.psum(jnp.sum(w), axis_name)
    err = jax.lax.psum(jnp.sum(jnp.where(ok, d2, 0.0)), axis_name)
    fit = cnt / n_src
    rmse = jnp.sqrt(err / jnp.maximum(cnt, 1.0))
    rmse = jnp.where(cnt > 0, rmse, 0.0)

    idx_bin = jnp.where(ok, idxf, float(rungrid.INVALID_INDEX)) \
        .astype(jnp.int32)
    flat_q = qidx.reshape(-1)
    okq = flat_q >= 0
    slot = jnp.where(okq, flat_q, Np)
    idx_src = jnp.full((Np + 1,), rungrid.INVALID_INDEX, jnp.int32) \
        .at[slot].set(jnp.where(okq, idx_bin.reshape(-1),
                                rungrid.INVALID_INDEX),
                      mode="drop")[:Np]
    return T, idx_src, fit, rmse, it, nq_dropped
