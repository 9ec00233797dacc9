"""Active-cell compacted pool grid (surface clouds): plan decides,
results match the dense grid exactly."""
import numpy as np
import jax.numpy as jnp
import pytest

from cupoch_tpu.knn import poolgrid
from cupoch_tpu.registration import fused_icp
from cupoch_tpu.registration.estimation import (
    TransformationEstimationType,
)
from cupoch_tpu.utility.shape import bucket_size, pad_axis0, valid_mask


def _surface_cloud(n=40_000, seed=0):
    """Points on a wavy sheet — a sparse-occupancy surface scan."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 2.0, size=(n, 2)).astype(np.float32)
    z = 0.25 * np.sin(3.0 * xy[:, 0]) * np.cos(2.0 * xy[:, 1]) \
        + 0.02 * rng.normal(size=n).astype(np.float32)
    return np.concatenate([xy, z[:, None].astype(np.float32)], -1)


RADIUS = 0.05


@pytest.fixture(scope="module")
def grids():
    tgt = _surface_cloud()
    src = tgt + np.float32([0.004, -0.003, 0.002])
    plan = poolgrid.plan_poolgrid(tgt, RADIUS, query_points=src,
                                  est=poolgrid.EST_NONE)
    assert plan is not None
    assert plan["active_cells"] is not None, \
        "surface cloud must trigger compaction"
    n_cells = int(np.prod(plan["dims"]))
    assert plan["n_active"] < 0.55 * n_cells

    cap = bucket_size(tgt.shape[0])
    tgt_j = pad_axis0(jnp.asarray(tgt), cap)
    tmask = valid_mask(tgt.shape[0], cap)
    attrs = jnp.zeros((cap, 0), jnp.float32)

    def build(active):
        return poolgrid.make_poolgrid(
            tgt_j, attrs, plan["origin"], plan["cell_size"],
            plan["dims"], plan["cap"], plan["kc"],
            est=poolgrid.EST_NONE, tile=plan["tile"], mask=tmask,
            active_cells=active)

    dense = build(None)
    compact = build(plan["active_cells"])
    return tgt, src, plan, dense, compact


def _corres(grid, plan, src, src_mask=None):
    n = src.shape[0]
    cap = bucket_size(n)
    src_j = pad_axis0(jnp.asarray(src), cap)
    mask = valid_mask(n, cap)
    qpool, qidx, nq = poolgrid.bin_queries_pool(
        src_j, jnp.eye(4, dtype=jnp.float32), grid.origin,
        grid.cell_size, grid.dims, plan["qp"], grid.tile, mask=mask,
        cell_map=grid.cell_map,
        n_rank_pad=grid.n_tiles * grid.tile)
    params = poolgrid.make_params(jnp.eye(4, dtype=jnp.float32),
                                  jnp.float32(RADIUS) ** 2, grid)
    d2, idxf = poolgrid.fused_pool_query(grid, qpool, params,
                                         poolgrid.EST_NONE, True)
    # scatter back to source order
    out = np.full(n, -1, np.int64)
    outd = np.full(n, np.inf, np.float32)
    qi = np.asarray(qidx).reshape(-1)
    ok = (qi >= 0) & (qi < n)
    out[qi[ok]] = np.asarray(idxf).reshape(-1)[ok].astype(np.int64)
    outd[qi[ok]] = np.asarray(d2).reshape(-1)[ok]
    return out, outd, int(nq)


def test_compact_matches_dense_correspondence(grids):
    tgt, src, plan, dense, compact = grids
    assert compact.scan.shape[0] < dense.scan.shape[0] * 0.6
    idx_d, d2_d, _ = _corres(dense, plan, src)
    idx_c, d2_c, _ = _corres(compact, plan, src)
    both = (idx_d >= 0) & (idx_c >= 0)
    assert both.mean() > 0.99
    # identical winners (identical scores -> identical packed keys)
    agree = (idx_d[both] == idx_c[both])
    assert agree.mean() > 0.999
    np.testing.assert_allclose(d2_c[both][agree],
                               d2_d[both][agree], rtol=1e-5)
    # every dense match present in compact too (no lost coverage)
    assert ((idx_d >= 0) == (idx_c >= 0)).mean() > 0.999


def test_matchless_queries_dropped_not_miscounted(grids):
    tgt, src, plan, dense, compact = grids
    # queries far off the surface: provably matchless -> no corres,
    # and NOT counted as capacity drops
    far = src + np.float32([0.0, 0.0, 1.5])
    idx_c, _, nq = _corres(compact, plan, far)
    assert (idx_c < 0).all()
    assert nq == 0


def test_compact_icp_converges(grids):
    tgt, src, plan, dense, compact = grids
    n = src.shape[0]
    cap = bucket_size(n)
    src_j = pad_axis0(jnp.asarray(src), cap)
    mask = valid_mask(n, cap)
    T, idx, fit, rmse, it, nq = fused_icp.icp_core_pool(
        src_j, mask, jnp.zeros((cap, 0), jnp.float32), compact,
        jnp.eye(4, dtype=jnp.float32), jnp.float32(RADIUS),
        plan["rebin_margin"], jnp.float32(1e-6), jnp.float32(1e-6),
        plan["qp"], TransformationEstimationType.PointToPoint, 10)
    assert float(fit) > 0.98
    # recovers the -[0.004,-0.003,0.002] shift
    np.testing.assert_allclose(
        np.asarray(T)[:3, 3], [-0.004, 0.003, -0.002], atol=2e-3)
