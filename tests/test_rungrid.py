"""Run-structured grid: brute-force equivalence + fused ICP parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cupoch_tpu.knn import bruteforce, rungrid
from cupoch_tpu.registration import fused_icp
from cupoch_tpu.registration.estimation import TransformationEstimationType


def _make_grid(tgt, r, nch=0, attrs=None, est=rungrid.EST_NONE, **kw):
    plan = rungrid.plan_rungrid(tgt, r, margin=0.0, **kw)
    assert plan is not None
    if attrs is None:
        attrs = jnp.zeros((tgt.shape[0], nch), jnp.float32)
    grid = rungrid.make_rungrid(
        jnp.asarray(tgt), attrs, plan["origin"], plan["cell_size"],
        plan["dims"], plan["cap"], est=est)
    return grid, plan


def test_nn_matches_bruteforce(rng):
    tgt = rng.uniform(size=(3000, 3)).astype(np.float32)
    q = rng.uniform(size=(500, 3)).astype(np.float32)
    r = 0.08
    grid, plan = _make_grid(tgt, r)
    idx, d2 = rungrid.query_nn_rungrid(grid, jnp.asarray(q), r,
                                       plan["qcap"])
    bi, bd = bruteforce.nn_search(jnp.asarray(q), jnp.asarray(tgt))
    bi = np.where(np.asarray(bd) <= r * r, np.asarray(bi), -1)
    idx = np.asarray(idx)
    # nn_search's documented contract: the index may differ only on
    # ties at f32-accumulation noise; the returned distance is exact
    same = idx == bi
    tie = (~same) & (idx >= 0) & (bi >= 0) & (
        np.abs(np.asarray(d2) - np.asarray(bd)) <= 1e-6)
    assert (same | tie).all(), \
        f"non-tie mismatches: {np.nonzero(~(same | tie))[0][:5]}"
    assert same.mean() > 0.99
    ok = bi >= 0
    np.testing.assert_allclose(np.asarray(d2)[ok & same],
                               np.asarray(bd)[ok & same],
                               rtol=0, atol=2e-6)


def test_nn_out_of_range(rng):
    tgt = rng.uniform(size=(2000, 3)).astype(np.float32)
    q = tgt[:100] + np.float32([10.0, 0, 0])  # far outside
    grid, plan = _make_grid(tgt, 0.05)
    idx, d2 = rungrid.query_nn_rungrid(grid, jnp.asarray(q), 0.05,
                                       plan["qcap"])
    assert (np.asarray(idx) == -1).all()
    assert np.isinf(np.asarray(d2)).all()


def test_self_query(rng):
    tgt = rng.uniform(size=(2500, 3)).astype(np.float32)
    grid, plan = _make_grid(tgt, 0.05)
    idx, d2 = rungrid.query_nn_rungrid(grid, jnp.asarray(tgt), 0.05,
                                       plan["qcap"])
    # every point finds itself (cap drops < 0.5% of slots)
    hit = np.asarray(idx) == np.arange(len(tgt))
    assert hit.mean() > 0.99
    assert np.nanmax(np.where(hit, np.asarray(d2), 0.0)) < 1e-9


@pytest.mark.parametrize("est_type", [
    TransformationEstimationType.PointToPoint,
    TransformationEstimationType.PointToPlane,
    TransformationEstimationType.SymmetricMethod,
])
def test_fused_icp_converges(rng, est_type):
    n = 4000
    tgt = rng.uniform(size=(n, 3)).astype(np.float32)
    tn = rng.normal(size=(n, 3)).astype(np.float32)
    tn /= np.linalg.norm(tn, axis=1, keepdims=True)
    ang = 0.03
    R = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
                   np.float32)
    t_true = np.float32([0.012, -0.008, 0.004])
    # src transformed by T_true^-1: ICP should recover T_true
    src = (tgt - t_true) @ R

    attrs, est_code = fused_icp.make_target_attrs(
        est_type, jnp.asarray(tgt), jnp.asarray(tn))
    r = 0.07
    plan = rungrid.plan_rungrid(tgt, r, margin=0.25, query_points=src)
    grid = rungrid.make_rungrid(
        jnp.asarray(tgt), attrs, plan["origin"], plan["cell_size"],
        plan["dims"], plan["cap"], est=est_code)
    src_n = (rng.normal(size=(n, 3)) if est_type
             != TransformationEstimationType.SymmetricMethod else tn @ R)
    src_n = (src_n / np.linalg.norm(src_n, axis=1, keepdims=True)
             ).astype(np.float32)
    T, idx, fit, rmse, it = fused_icp.icp_core_rungrid(
        jnp.asarray(src), jnp.ones(n, bool), jnp.asarray(src_n),
        grid, jnp.eye(4, dtype=jnp.float32), jnp.float32(r),
        plan["rebin_margin"], jnp.float32(1e-6), jnp.float32(1e-6),
        plan["qcap"], est_type, 30)
    T = np.asarray(T)
    # src = R^T (tgt - t)  =>  T_true maps src back: R @ src + t
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = R
    T_true[:3, 3] = t_true
    assert float(fit) > 0.97
    assert float(rmse) < 5e-3
    np.testing.assert_allclose(T, T_true, atol=2e-3)
    # correspondence indices are in range and mostly correct
    idx = np.asarray(idx)
    assert ((idx >= -1) & (idx < n)).all()
    assert (idx >= 0).mean() > 0.97


def test_fused_icp_matches_legacy_metrics(rng):
    """Fused pt2plane ICP fitness/rmse/T agree with the brute-force
    legacy core on the same problem."""
    from cupoch_tpu.registration.registration import _icp_core

    n = 1500
    tgt = rng.uniform(size=(n, 3)).astype(np.float32)
    tn = rng.normal(size=(n, 3)).astype(np.float32)
    tn /= np.linalg.norm(tn, axis=1, keepdims=True)
    src = tgt - np.float32([0.004, 0.006, -0.002])
    r = 0.06
    est = TransformationEstimationType.PointToPlane

    mask = jnp.ones(n, bool)
    T_l, idx_l, fit_l, rmse_l, it_l = _icp_core(
        jnp.asarray(src), mask, jnp.zeros((n, 3), jnp.float32),
        jnp.asarray(tgt), mask, jnp.asarray(tn),
        jnp.eye(4, dtype=jnp.float32), jnp.float32(r),
        jnp.float32(1e-6), jnp.float32(1e-6), est, 12, False)

    attrs, est_code = fused_icp.make_target_attrs(
        est, jnp.asarray(tgt), jnp.asarray(tn))
    plan = rungrid.plan_rungrid(tgt, r, margin=0.25, query_points=src)
    grid = rungrid.make_rungrid(
        jnp.asarray(tgt), attrs, plan["origin"], plan["cell_size"],
        plan["dims"], plan["cap"], est=est_code)
    T_f, idx_f, fit_f, rmse_f, it_f = fused_icp.icp_core_rungrid(
        jnp.asarray(src), mask, jnp.zeros((n, 3), jnp.float32), grid,
        jnp.eye(4, dtype=jnp.float32), jnp.float32(r),
        plan["rebin_margin"], jnp.float32(1e-6), jnp.float32(1e-6),
        plan["qcap"], est, 12)
    np.testing.assert_allclose(np.asarray(T_f), np.asarray(T_l),
                               atol=5e-4)
    assert abs(float(fit_f) - float(fit_l)) < 0.02
    assert abs(float(rmse_f) - float(rmse_l)) < 5e-4


def test_pallas_interpret_matches_xla(rng):
    """The gated Pallas kernel agrees with the ungated XLA path (run
    in interpreter mode on CPU): same winners, same GN sums."""
    tgt = rng.uniform(size=(1200, 3)).astype(np.float32)
    tn = rng.normal(size=(1200, 3)).astype(np.float32)
    tn /= np.linalg.norm(tn, axis=1, keepdims=True)
    q = rng.uniform(size=(800, 3)).astype(np.float32)
    r = 0.09
    est = TransformationEstimationType.PointToPlane
    attrs, est_code = fused_icp.make_target_attrs(
        est, jnp.asarray(tgt), jnp.asarray(tn))
    plan = rungrid.plan_rungrid(tgt, r, margin=0.0)
    grid = rungrid.make_rungrid(
        jnp.asarray(tgt), attrs, plan["origin"], plan["cell_size"],
        plan["dims"], plan["cap"], est=est_code)
    qsoa, qidx = rungrid.bin_queries(
        jnp.asarray(q), jnp.asarray(q), grid.origin, grid.cell_size,
        grid.dims, plan["qcap"])
    T = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(
        jnp.asarray([0.002, -0.001, 0.003]))
    params = rungrid.make_params(T, jnp.float32(r) ** 2, grid)
    # corres mode
    d2_p, ni_p = rungrid.fused_query(grid, qsoa, qidx, params,
                                     rungrid.EST_NONE, True,
                                     use_pallas="interpret")
    d2_x, ni_x = rungrid.fused_query(grid, qsoa, qidx, params,
                                     rungrid.EST_NONE, True,
                                     use_pallas=False)
    np.testing.assert_array_equal(np.asarray(ni_p), np.asarray(ni_x))
    np.testing.assert_allclose(
        np.where(np.isfinite(d2_p), d2_p, 0.0),
        np.where(np.isfinite(d2_x), d2_x, 0.0), atol=1e-7)
    # GN mode
    s_p = rungrid.fused_query(grid, qsoa, qidx, params,
                              rungrid.EST_PT2PL, False,
                              use_pallas="interpret")
    s_x = rungrid.fused_query(grid, qsoa, qidx, params,
                              rungrid.EST_PT2PL, False,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(jnp.sum(s_p, 0)),
                               np.asarray(jnp.sum(s_x, 0)),
                               rtol=2e-4, atol=1e-5)


def test_knn_matches_bruteforce(rng):
    data = rng.uniform(size=(2500, 3)).astype(np.float32)
    q = rng.uniform(size=(400, 3)).astype(np.float32)
    k = 12
    out = rungrid.knn_search_grid(q, data, k)
    assert out is not None
    idx, d2 = out
    bi, bd = bruteforce.knn_search(jnp.asarray(q), jnp.asarray(data), k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(bi))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(bd),
                               rtol=0, atol=2e-6)


def test_knn_hybrid_matches_bruteforce(rng):
    data = rng.uniform(size=(2500, 3)).astype(np.float32)
    q = rng.uniform(size=(300, 3)).astype(np.float32)
    k, r = 10, 0.05
    out = rungrid.knn_search_grid(q, data, k, radius=r)
    assert out is not None
    idx, d2 = out
    bi, bd, _ = bruteforce.hybrid_search(jnp.asarray(q),
                                         jnp.asarray(data), r, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(bi))
    ok = np.asarray(bi) >= 0
    np.testing.assert_allclose(np.asarray(d2)[ok], np.asarray(bd)[ok],
                               rtol=0, atol=2e-6)
