"""Multi-chip registration: the production fused ICP loop, sharded.

New scope vs the single-GPU reference (SURVEY.md §2.13, BASELINE.md):
source points are sharded across a 1-D `jax.sharding.Mesh`; the target
run-grid (knn/rungrid.py) is replicated.  Each device runs the SAME
fully-fused while-loop body as the single-chip path
(registration/fused_icp.icp_core_rungrid) on its query shard — grid
correspondence, in-kernel Gauss-Newton reduction, per-shard re-binning
— and the only cross-device traffic is a `psum` of the 32 normal-
equation floats per iteration (plus pmin/pmax of the AABB once), so
scaling efficiency is bounded by compute balance, not communication.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..knn import rungrid
from ..registration import fused_icp
from ..registration.estimation import TransformationEstimationType
from ..utility.transforms import transform_points

POINTS_AXIS = "points"


def make_point_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D device mesh over the point-sharding axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (POINTS_AXIS,))


def sharded_icp_fn(mesh: Mesh, qcap: int,
                   est_type: TransformationEstimationType,
                   max_iteration: int,
                   use_pallas: Optional[bool] = None):
    """Build the sharded full-loop ICP:
    fn(src [N,3] sharded, src_mask, src_normals, grid (replicated),
       init_T, max_dist, rebin_margin, rel_fitness, rel_rmse)
    -> (T, idx [N] sharded, fitness, rmse, iterations)."""
    body = partial(fused_icp.icp_core_rungrid,
                   qcap=qcap, est_type=est_type,
                   max_iteration=max_iteration, use_pallas=use_pallas,
                   axis_name=POINTS_AXIS)
    shard = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(POINTS_AXIS), P(POINTS_AXIS), P(POINTS_AXIS),
                  P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(POINTS_AXIS), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shard)


def sharded_registration_icp(
    src_np, tgt_np, tgt_normals_np, max_dist: float, mesh: Mesh,
    est_type=TransformationEstimationType.PointToPlane,
    max_iteration: int = 20, relative_fitness: float = 1e-6,
    relative_rmse: float = 1e-6, init_T=None,
    use_pallas: Optional[bool] = None, margin: float = 0.25,
):
    """Plan + build the replicated target grid, shard the source, and
    run the fused multi-iteration ICP loop over `mesh`.

    Returns (T [4,4] np, fitness, rmse, iterations, seconds) where
    seconds covers grid build + the full loop (for bench/scaling.py).
    """
    import time

    D = mesh.devices.size
    n = src_np.shape[0]
    n_pad = -(-n // (8 * D)) * (8 * D)
    src_pad = np.zeros((n_pad, 3), np.float32)
    src_pad[:n] = src_np
    mask = np.zeros(n_pad, bool)
    mask[:n] = True

    tgt_j = jnp.asarray(tgt_np, jnp.float32)
    tn_j = jnp.asarray(tgt_normals_np, jnp.float32)
    attrs, est_code = fused_icp.make_target_attrs(
        est_type, tgt_j, tn_j)
    init = np.eye(4, dtype=np.float32) if init_T is None else \
        np.asarray(init_T, np.float32)
    src_t = src_np @ init[:3, :3].T + init[:3, 3]
    plan = rungrid.plan_rungrid(tgt_np, max_dist, margin=margin,
                                query_points=src_t,
                                nch=int(attrs.shape[1]))
    if plan is None:
        raise ValueError("cloud unsuitable for a dense run grid")

    shard_spec = NamedSharding(mesh, P(POINTS_AXIS))
    rep = NamedSharding(mesh, P())
    src_j = jax.device_put(jnp.asarray(src_pad), shard_spec)
    mask_j = jax.device_put(jnp.asarray(mask), shard_spec)
    nrm_j = jax.device_put(jnp.zeros_like(src_j), shard_spec)

    fn = sharded_icp_fn(mesh, plan["qcap"], est_type, max_iteration,
                        use_pallas=use_pallas)

    def run():
        grid = rungrid.make_rungrid(
            tgt_j, attrs, plan["origin"], plan["cell_size"],
            plan["dims"], plan["cap"], est=est_code, kc=plan["kc"])
        grid = jax.device_put(grid, rep)
        return fn(src_j, mask_j, nrm_j, grid,
                  jax.device_put(jnp.asarray(init), rep),
                  jnp.float32(max_dist), plan["rebin_margin"],
                  jnp.float32(relative_fitness),
                  jnp.float32(relative_rmse))

    T, idx, fit, rmse, it = run()        # compile + warm
    _ = float(fit)
    t0 = time.perf_counter()
    T, idx, fit, rmse, it = run()
    _ = float(fit)
    dt = time.perf_counter() - t0
    return (np.asarray(T), float(fit), float(rmse), int(it), dt)


def sharded_transform(mesh: Mesh):
    """pjit point transform with points sharded across the mesh."""

    @partial(jax.jit,
             in_shardings=(NamedSharding(mesh, P()),
                           NamedSharding(mesh, P(POINTS_AXIS))),
             out_shardings=NamedSharding(mesh, P(POINTS_AXIS)))
    def fn(T, points):
        return transform_points(T, points)

    return fn


def ring_sharded_pool_icp_fn(mesh: Mesh, qp: int,
                             est_type: TransformationEstimationType,
                             max_iteration: int,
                             use_pallas: Optional[bool] = None):
    """Build the CELL-SHARDED full-loop ICP (fused_icp.
    icp_core_pool_ring): the pooled grid's score table is sharded by
    supertile across the mesh and ring-rotated with `ppermute`, so the
    target map is bounded by TOTAL mesh HBM instead of one device's
    (VERDICT r3 item 5). In/out: src sharded by points; grid scan
    sharded on its leading axis; binfields/scalars replicated."""
    from ..knn import poolgrid as _pg

    D = mesh.devices.size
    body = partial(fused_icp.icp_core_pool_ring,
                   qp=qp, est_type=est_type,
                   max_iteration=max_iteration, n_shards=D,
                   use_pallas=use_pallas, axis_name=POINTS_AXIS)
    grid_static = {}
    shard = jax.shard_map(
        lambda s, m, a, gscan, gscanlo, gbf, gor, gcs, goff,
        gnd, gcm, T0, md, rm, rf, rr: body(
            s, m, a,
            _pg.PoolGrid(gscan, gscanlo, gbf, gor, gcs, goff,
                         grid_static["dims"], grid_static["cap"],
                         grid_static["kc"], grid_static["est"],
                         grid_static["tile"], n_dropped=gnd,
                         cell_map=gcm),
            T0, md, rm, rf, rr),
        mesh=mesh,
        in_specs=(P(POINTS_AXIS), P(POINTS_AXIS), P(POINTS_AXIS),
                  P(POINTS_AXIS), P(POINTS_AXIS), P(), P(), P(),
                  P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(POINTS_AXIS), P(), P(), P(), P()),
        check_vma=False,
    )

    def fn(src, mask, aux, grid, init_T, max_dist, rebin_margin,
           rel_fit, rel_rmse):
        grid_static.update(dims=grid.dims, cap=grid.cap, kc=grid.kc,
                           est=grid.est, tile=grid.tile)
        # a size-0 map stands in for None (shard_map specs cannot
        # carry None); bin_queries_pool treats it as dense
        cm = grid.cell_map if grid.cell_map is not None \
            else jnp.zeros((0,), jnp.int32)
        return shard(src, mask, aux, grid.scan, grid.scan_lo,
                     grid.binfields, grid.origin,
                     grid.cell_size, grid.off, grid.n_dropped, cm,
                     init_T, max_dist, rebin_margin, rel_fit, rel_rmse)

    return fn


def ring_sharded_registration_icp(
    src_np, tgt_np, tgt_normals_np, max_dist: float, mesh: Mesh,
    est_type=TransformationEstimationType.PointToPlane,
    max_iteration: int = 20, relative_fitness: float = 1e-6,
    relative_rmse: float = 1e-6, init_T=None,
    use_pallas: Optional[bool] = None, margin: float = 0.375,
):
    """Cell-sharded counterpart of `sharded_registration_icp`: plans
    the pooled grid with C padded to a multiple of tile*D, shards
    the scan table across the mesh, and runs the ring ICP loop.

    Returns (T [4,4] np, fitness, rmse, iterations, seconds)."""
    import time

    from ..knn import poolgrid

    D = mesh.devices.size
    n = src_np.shape[0]
    n_pad = -(-n // (8 * D)) * (8 * D)
    src_pad = np.zeros((n_pad, 3), np.float32)
    src_pad[:n] = src_np
    mask = np.zeros(n_pad, bool)
    mask[:n] = True

    tgt_j = jnp.asarray(tgt_np, jnp.float32)
    tn_j = jnp.asarray(tgt_normals_np, jnp.float32)
    attrs, est_code = fused_icp.make_target_attrs(
        est_type, tgt_j, tn_j)
    init = np.eye(4, dtype=np.float32) if init_T is None else \
        np.asarray(init_T, np.float32)
    src_t = src_np @ init[:3, :3].T + init[:3, 3]
    plan = poolgrid.plan_poolgrid(tgt_np, max_dist, margin=margin,
                                  query_points=src_t, est=est_code,
                                  shards=D)
    if plan is None:
        raise ValueError("cloud unsuitable for a pooled grid")

    shard_spec = NamedSharding(mesh, P(POINTS_AXIS))
    rep = NamedSharding(mesh, P())
    src_j = jax.device_put(jnp.asarray(src_pad), shard_spec)
    mask_j = jax.device_put(jnp.asarray(mask), shard_spec)
    aux_j = jax.device_put(
        jnp.zeros((n_pad, 0), jnp.float32), shard_spec)

    fn = ring_sharded_pool_icp_fn(mesh, plan["qp"], est_type,
                                  max_iteration, use_pallas=use_pallas)

    def put_grid(grid):
        grid.scan = jax.device_put(grid.scan, shard_spec)
        grid.scan_lo = jax.device_put(grid.scan_lo, shard_spec)
        for leaf in ("binfields", "origin", "cell_size",
                     "off", "n_dropped"):
            setattr(grid, leaf, jax.device_put(getattr(grid, leaf),
                                               rep))
        if grid.cell_map is not None:
            grid.cell_map = jax.device_put(grid.cell_map, rep)
        return grid

    def run():
        grid = put_grid(poolgrid.make_poolgrid(
            tgt_j, attrs, plan["origin"], plan["cell_size"],
            plan["dims"], plan["cap"], plan["kc"], est=est_code,
            tile=plan["tile"], shards=D,
            active_cells=plan.get("active_cells")))
        return fn(src_j, mask_j, aux_j, grid,
                  jax.device_put(jnp.asarray(init), rep),
                  jnp.float32(max_dist), plan["rebin_margin"],
                  jnp.float32(relative_fitness),
                  jnp.float32(relative_rmse))

    T, idx, fit, rmse, it, _nq = run()   # compile + warm
    _ = float(fit)
    t0 = time.perf_counter()
    T, idx, fit, rmse, it, _nq = run()
    _ = float(fit)
    dt = time.perf_counter() - t0
    return (np.asarray(T), float(fit), float(rmse), int(it), dt)
