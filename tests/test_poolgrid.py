"""Pooled-query MXU correspondence grid (knn/poolgrid.py).

Strategy mirrors the reference's kd-tree tests (SURVEY.md §4):
brute-force goldens for correspondence, interpret-mode Pallas parity
against the XLA fallback, and full fused-ICP agreement with the
round-3 rungrid path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cupoch_tpu.knn import bruteforce, poolgrid, rungrid
from cupoch_tpu.registration import fused_icp
from cupoch_tpu.registration.estimation import (
    TransformationEstimationType,
)


def _cloud(rng, n, scale=1.0):
    return (rng.uniform(size=(n, 3)) * scale).astype(np.float32)


def _normals(rng, n):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _setup(rng, est, m=4000, n=3000, radius=0.06):
    tgt = _cloud(rng, m)
    tn = _normals(rng, m)
    src = _cloud(rng, n)
    attrs, est_code = fused_icp.make_target_attrs(
        est, jnp.asarray(tgt), jnp.asarray(tn))
    plan = poolgrid.plan_poolgrid(tgt, radius, margin=0.25,
                                  query_points=src, est=est_code)
    grid = poolgrid.make_poolgrid(
        jnp.asarray(tgt), attrs, plan["origin"], plan["cell_size"],
        plan["dims"], plan["cap"], plan["kc"], est=est_code,
        tile=plan["tile"])
    qpool, qidx, _ = poolgrid.bin_queries_pool(
        jnp.asarray(src), jnp.eye(4, dtype=jnp.float32), grid.origin,
        grid.cell_size, grid.dims, plan["qp"], plan["tile"])
    params = poolgrid.make_params(
        jnp.eye(4, dtype=jnp.float32), jnp.float32(radius) ** 2, grid)
    return tgt, src, grid, qpool, qidx, params, plan, est_code


def _scatter(qidx, vals, n, fill):
    out = np.full(n, fill, np.float64)
    qi = np.asarray(qidx).reshape(-1)
    v = np.asarray(vals).reshape(-1)
    ok = qi >= 0
    out[qi[ok]] = v[ok]
    return out


def test_corres_matches_bruteforce(rng):
    radius = 0.06
    tgt, src, grid, qpool, qidx, params, plan, est = _setup(
        rng, TransformationEstimationType.PointToPlane, radius=radius)
    d2, idxf = poolgrid.fused_pool_query(grid, qpool, params, est,
                                         True, use_pallas=False)
    n = src.shape[0]
    d2s = _scatter(qidx, d2, n, np.inf)
    idxs = _scatter(qidx, idxf, n, -1).astype(np.int64)

    bi, bd2 = bruteforce.nn_search(jnp.asarray(src), jnp.asarray(tgt))
    bi = np.asarray(bi)
    bd2 = np.asarray(bd2)
    bfound = bd2 <= radius ** 2
    found = np.isfinite(d2s)
    assert (found == bfound).all()
    # bf16 score selection may pick a near-tie; distance must agree to
    # selection precision
    derr = np.abs(np.sqrt(d2s[found]) - np.sqrt(bd2[bfound]))
    assert derr.max() < 2e-3
    # corres passes select with split-precision (~f32) scores; only
    # sub-quantum ties may disagree with the exact argmin
    assert (idxs[found] == bi[found]).mean() > 0.995


def test_interpret_kernel_parity(rng):
    tgt, src, grid, qpool, qidx, params, plan, est = _setup(
        rng, TransformationEstimationType.PointToPlane,
        m=2000, n=1500)
    d2x, idxx = poolgrid.fused_pool_query(grid, qpool, params, est,
                                          True, use_pallas=False)
    d2i, idxi = poolgrid.fused_pool_query(grid, qpool, params, est,
                                          True, use_pallas="interpret")
    np.testing.assert_allclose(
        np.where(np.isfinite(d2x), d2x, -1.0),
        np.where(np.isfinite(d2i), d2i, -1.0), atol=1e-6)
    assert (np.asarray(idxx) == np.asarray(idxi)).all()

    sx = poolgrid.fused_pool_query(grid, qpool, params, est, False,
                                   use_pallas=False)
    si = poolgrid.fused_pool_query(grid, qpool, params, est, False,
                                   use_pallas="interpret")
    np.testing.assert_allclose(np.asarray(jnp.sum(sx, 0)),
                               np.asarray(jnp.sum(si, 0)),
                               rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("est_t", [
    TransformationEstimationType.PointToPoint,
    TransformationEstimationType.PointToPlane,
    TransformationEstimationType.SymmetricMethod,
])
def test_icp_pool_matches_rungrid(rng, est_t):
    m = 20000
    tgt = _cloud(rng, m, scale=1.0)
    tn = _normals(rng, m)
    ang = 0.015
    R = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0],
                    [0, 0, 1]], np.float32)
    src = (tgt - np.float32([0.004, -0.006, 0.002])) @ R
    radius = 0.05
    src_j = jnp.asarray(src)
    tgt_j = jnp.asarray(tgt)
    tn_j = jnp.asarray(tn)
    mask = jnp.ones(m, bool)
    sn_j = rungrid_src_normals = tn_j  # same cloud: reuse as src normals
    T0 = jnp.eye(4, dtype=jnp.float32)
    attrs, est_code = fused_icp.make_target_attrs(est_t, tgt_j, tn_j)

    pplan = poolgrid.plan_poolgrid(tgt, radius, margin=0.375,
                                   query_points=src, est=est_code)
    pgrid = poolgrid.make_poolgrid(
        tgt_j, attrs, pplan["origin"], pplan["cell_size"],
        pplan["dims"], pplan["cap"], pplan["kc"], est=est_code,
        tile=pplan["tile"], mask=mask)
    Tp, idxp, fitp, rmsep, itp, _nd = fused_icp.icp_core_pool(
        src_j, mask, sn_j, pgrid, T0, jnp.float32(radius),
        pplan["rebin_margin"], jnp.float32(1e-6), jnp.float32(1e-6),
        pplan["qp"], est_t, 20)

    rplan = rungrid.plan_rungrid(tgt, radius, margin=0.375,
                                 query_points=src,
                                 nch=int(attrs.shape[1]))
    rgrid = rungrid.make_rungrid(
        tgt_j, attrs, rplan["origin"], rplan["cell_size"],
        rplan["dims"], rplan["cap"], mask=mask, est=est_code,
        kc=rplan["kc"])
    Tr, idxr, fitr, rmser, itr = fused_icp.icp_core_rungrid(
        src_j, mask, sn_j, rgrid, T0, jnp.float32(radius),
        rplan["rebin_margin"], jnp.float32(1e-6), jnp.float32(1e-6),
        rplan["qcap"], est_t, 20)

    # both must recover the ground-truth rigid motion: with row-vector
    # sources src = (tgt - t) @ R, the aligning transform is [R | t]
    Tgt = np.eye(4, dtype=np.float32)
    Tgt[:3, :3] = R
    Tgt[:3, 3] = np.float32([0.004, -0.006, 0.002])
    assert np.abs(np.asarray(Tp) - Tgt).max() < 5e-4
    assert np.abs(np.asarray(Tp) - np.asarray(Tr)).max() < 1e-3
    assert abs(float(fitp) - float(fitr)) < 5e-3
    assert float(fitp) > 0.99


def test_overflow_reported(rng):
    # one dense clump forces per-cell cap overflow; the build must
    # COUNT the dropped candidates (VERDICT r3 item 9)
    tgt = np.concatenate([
        _cloud(rng, 2000),
        np.float32([[0.5, 0.5, 0.5]]) + rng.normal(
            size=(3000, 3)).astype(np.float32) * 1e-4])
    plan = poolgrid.plan_poolgrid(tgt, 0.05, margin=0.25,
                                  cap_percentile=90.0)
    if plan is None:
        pytest.skip("plan rejected clump cloud")
    grid = poolgrid.make_poolgrid(
        jnp.asarray(tgt), jnp.zeros((tgt.shape[0], 0), jnp.float32),
        plan["origin"], plan["cell_size"], plan["dims"], plan["cap"],
        plan["kc"])
    assert int(grid.n_dropped) > 0


def test_query_pool_overflow_reported(rng):
    src = np.float32([[0.5, 0.5, 0.5]]) + rng.normal(
        size=(500, 3)).astype(np.float32) * 1e-4
    tgt = _cloud(rng, 2000)
    plan = poolgrid.plan_poolgrid(tgt, 0.05, margin=0.25)
    qpool, qidx, ndrop = poolgrid.bin_queries_pool(
        jnp.asarray(src), jnp.eye(4, dtype=jnp.float32),
        jnp.asarray(plan["origin"]),
        plan["cell_size"], plan["dims"], 8, plan["tile"])
    assert int(ndrop) > 0
    assert int(ndrop) + int((np.asarray(qidx) >= 0).sum()) == 500


def _colored_pair(rng, m=25000):
    tgt = _cloud(rng, m)
    # smooth color field so the photometric term is informative
    cols = np.stack([
        0.5 + 0.4 * np.sin(3.0 * tgt[:, 0]),
        0.5 + 0.4 * np.cos(2.0 * tgt[:, 1]),
        0.5 + 0.4 * np.sin(4.0 * tgt[:, 2])], -1).astype(np.float32)
    ang = 0.01
    R = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0],
                    [0, 0, 1]], np.float32)
    t = np.float32([0.003, -0.004, 0.002])
    src = (tgt - t) @ R
    Tgt = np.eye(4, dtype=np.float32)
    Tgt[:3, :3] = R
    Tgt[:3, 3] = t
    return tgt, cols, src, Tgt


def test_colored_icp_pool_path(rng):
    from cupoch_tpu.geometry import PointCloud
    from cupoch_tpu.knn import KDTreeSearchParamHybrid
    from cupoch_tpu.registration import registration_colored_icp
    from cupoch_tpu.registration import registration as reg_mod

    tgt, cols, src, Tgt = _colored_pair(rng)
    target = PointCloud(jnp.asarray(tgt))
    target.colors = jnp.asarray(cols)
    target.estimate_normals(KDTreeSearchParamHybrid(0.05, 20))
    source = PointCloud(jnp.asarray(src))
    source.colors = jnp.asarray(cols)  # colors move with the points

    assert tgt.shape[0] > reg_mod._GRID_THRESHOLD
    res = registration_colored_icp(source, target, 0.04)
    assert res.fitness > 0.99
    assert np.abs(res.transformation - Tgt).max() < 2e-3


def test_gicp_pool_path(rng):
    from cupoch_tpu.geometry import PointCloud
    from cupoch_tpu.registration import registration_generalized_icp
    from cupoch_tpu.registration import registration as reg_mod

    m = 25000
    tgt = _cloud(rng, m)
    ang = 0.01
    R = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0],
                    [0, 0, 1]], np.float32)
    t = np.float32([0.003, -0.004, 0.002])
    src = (tgt - t) @ R
    Tgt = np.eye(4, dtype=np.float32)
    Tgt[:3, :3] = R
    Tgt[:3, 3] = t
    target = PointCloud(jnp.asarray(tgt))
    source = PointCloud(jnp.asarray(src))
    assert m > reg_mod._GRID_THRESHOLD
    res = registration_generalized_icp(source, target, 0.04)
    assert res.fitness > 0.99
    assert np.abs(res.transformation - Tgt).max() < 2e-3


def test_colored_gicp_interpret_parity(rng):
    """Pallas (interpret) vs XLA fallback for the two new fused
    estimator kernels."""
    from cupoch_tpu.registration.estimation import (
        TransformationEstimationType as ET,
    )

    for est_t, est_code in ((ET.ColoredICP, poolgrid.EST_COLORED),
                            (ET.GeneralizedICP, poolgrid.EST_GICP)):
        m, n = 3000, 2000
        tgt = _cloud(rng, m)
        tn = _normals(rng, m)
        src = _cloud(rng, n)
        if est_code == poolgrid.EST_COLORED:
            tgt_aux = {"intensity": jnp.asarray(
                rng.uniform(size=m).astype(np.float32)),
                "gradient": jnp.asarray(
                rng.normal(size=(m, 3)).astype(np.float32))}
            src_extra = rng.uniform(size=(n, 1)).astype(np.float32)
            extra = (np.float32(0.98), np.float32(0.2))
        else:
            cov = rng.normal(size=(m, 3, 3)).astype(np.float32)
            cov = np.einsum("nij,nkj->nik", cov, cov) * 0.01 \
                + np.eye(3, dtype=np.float32) * 1e-3
            tgt_aux = {"cov": jnp.asarray(cov)}
            scov = rng.normal(size=(n, 3, 3)).astype(np.float32)
            scov = np.einsum("nij,nkj->nik", scov, scov) * 0.01 \
                + np.eye(3, dtype=np.float32) * 1e-3
            src_extra = np.asarray(fused_icp.cov_upper6(
                jnp.asarray(scov)))
            extra = (np.float32(0.0), np.float32(0.0))
        attrs, _ = fused_icp.make_target_attrs(
            est_t, jnp.asarray(tgt), jnp.asarray(tn), tgt_aux)
        plan = poolgrid.plan_poolgrid(tgt, 0.06, margin=0.25,
                                      query_points=src, est=est_code)
        grid = poolgrid.make_poolgrid(
            jnp.asarray(tgt), attrs, plan["origin"],
            plan["cell_size"], plan["dims"], plan["cap"], plan["kc"],
            est=est_code, tile=plan["tile"])
        qpool, qidx, _ = poolgrid.bin_queries_pool(
            jnp.asarray(src), jnp.eye(4, dtype=jnp.float32),
            grid.origin,
            grid.cell_size, grid.dims, plan["qp"], plan["tile"],
            extra=jnp.asarray(src_extra),
            n_extra=poolgrid.n_query_extra(est_code))
        params = poolgrid.make_params(
            jnp.eye(4, dtype=jnp.float32), jnp.float32(0.06) ** 2,
            grid, extra[0], extra[1])
        sx = poolgrid.fused_pool_query(grid, qpool, params, est_code,
                                       False, use_pallas=False)
        si = poolgrid.fused_pool_query(grid, qpool, params, est_code,
                                       False, use_pallas="interpret")
        np.testing.assert_allclose(
            np.asarray(jnp.sum(sx, 0)), np.asarray(jnp.sum(si, 0)),
            rtol=3e-5, atol=2e-4)


def test_registration_surfaces_drops_and_regrows(rng):
    """A pathological density clump must degrade LOUDLY: drop counts
    surface on RegistrationResult and the auto-regrow retry keeps the
    alignment usable (VERDICT r3 item 9)."""
    from cupoch_tpu.geometry import PointCloud
    from cupoch_tpu.knn import KDTreeSearchParamHybrid
    from cupoch_tpu.registration import (
        TransformationEstimationPointToPlane,
        registration_icp,
    )
    from cupoch_tpu.registration import registration as reg_mod

    base = _cloud(rng, 24000)
    clump = np.float32([[0.5, 0.5, 0.5]]) + rng.normal(
        size=(4000, 3)).astype(np.float32) * 2e-3
    tgt = np.concatenate([base, clump])
    t = np.float32([0.003, -0.004, 0.002])
    src = tgt - t
    target = PointCloud(jnp.asarray(tgt))
    target.estimate_normals(KDTreeSearchParamHybrid(0.05, 20))
    source = PointCloud(jnp.asarray(src))
    assert tgt.shape[0] > reg_mod._GRID_THRESHOLD
    res = registration_icp(
        source, target, 0.04,
        estimation=TransformationEstimationPointToPlane())
    # drop diagnostics exist on the result (0 after a successful
    # regrow; > 0 when the clump exceeds even the regrown cap)
    assert hasattr(res, "n_dropped_target")
    assert hasattr(res, "n_dropped_queries")
    assert res.fitness > 0.9
    assert np.abs(res.transformation[:3, 3] - t).max() < 2e-3
