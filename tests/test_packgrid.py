"""Packed compact-candidate grid tests (XLA fallback path; the Pallas
kernel is exercised on TPU and shares all index/score math)."""
import numpy as np
import pytest

import jax.numpy as jnp

from cupoch_tpu.knn import bruteforce, packgrid


def brute_nn(q, tgt, r):
    bidx, bd2 = bruteforce.nn_search(jnp.asarray(q), jnp.asarray(tgt))
    return np.where(np.asarray(bd2) <= r * r, np.asarray(bidx), -1)


def build(tgt, r, attrs=None, exact=True, **kw):
    plan = packgrid.plan_packgrid(tgt, r, margin=0.0, exact=exact, **kw)
    assert plan is not None
    if attrs is None:
        attrs = jnp.zeros((tgt.shape[0], 1), jnp.float32)
    grid = packgrid.make_packgrid(
        jnp.asarray(tgt), jnp.asarray(attrs), plan["origin"],
        plan["cell_size"], plan["dims"], plan["cap"], plan["kc"],
        plan["l1"])
    return grid, plan


def test_matches_brute_force(rng):
    tgt = rng.uniform(size=(4000, 3)).astype(np.float32)
    q = rng.uniform(size=(2500, 3)).astype(np.float32)
    r = 0.06
    grid, plan = build(tgt, r)
    idx, d2 = packgrid.query_nn_packgrid(grid, jnp.asarray(q), r,
                                         plan["qcap"])
    np.testing.assert_array_equal(np.asarray(idx), brute_nn(q, tgt, r))


def test_compacted_matches_brute_force(rng):
    """kc truncation at the default percentile still finds every NN on
    a uniform cloud (the dropped lanes are the farthest candidates of
    the densest 0.1% of blocks)."""
    tgt = rng.uniform(size=(20000, 3)).astype(np.float32)
    q = rng.uniform(size=(5000, 3)).astype(np.float32)
    r = 0.05
    grid, plan = build(tgt, r, exact=False)
    idx, d2 = packgrid.query_nn_packgrid(grid, jnp.asarray(q), r,
                                         plan["qcap"])
    ref = brute_nn(q, tgt, r)
    agree = (np.asarray(idx) == ref).mean()
    assert agree > 0.999


def test_queries_outside_grid(rng):
    tgt = rng.uniform(size=(1000, 3)).astype(np.float32)
    grid, plan = build(tgt, 0.1)
    q = rng.uniform(size=(100, 3)).astype(np.float32) + 50.0
    idx, d2 = packgrid.query_nn_packgrid(grid, jnp.asarray(q), 0.1,
                                         plan["qcap"])
    assert (np.asarray(idx) == -1).all()
    assert np.isinf(np.asarray(d2)).all()


def test_self_query_identity(rng):
    tgt = rng.uniform(size=(3000, 3)).astype(np.float32)
    grid, plan = build(tgt, 0.05)
    idx, d2 = packgrid.query_nn_packgrid(grid, jnp.asarray(tgt), 0.05,
                                         plan["qcap"])
    np.testing.assert_array_equal(np.asarray(idx), np.arange(3000))
    # expanded-form |q|^2+|c|^2-2qc cancels to ~1e-7 noise at exact zero
    np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-6)


def test_attr_fetch_matches_winner(rng):
    """Fetched attribute channels belong to the winning target index."""
    tgt = rng.uniform(size=(2000, 3)).astype(np.float32)
    attrs = rng.normal(size=(2000, 4)).astype(np.float32)
    q = rng.uniform(size=(1500, 3)).astype(np.float32)
    r = 0.08
    grid, plan = build(tgt, r, attrs=attrs)
    qsoa, _, qidx = packgrid.bin_queries(
        jnp.asarray(q), jnp.asarray(q), grid.origin, grid.cell_size,
        grid.dims, plan["qcap"])
    centers = packgrid._cell_centers(
        grid.dims, grid.origin, grid.cell_size, qsoa.shape[0])
    q8 = packgrid.prep_queries(qsoa, jnp.eye(4, dtype=jnp.float32),
                               centers)
    d2, attr_out = packgrid.query_packed(grid, q8, r)
    d2 = np.asarray(d2)
    attr_out = np.asarray(attr_out)
    qidx = np.asarray(qidx)
    win = (-attr_out[:, grid.nch, :]).astype(np.int32)
    ok = np.isfinite(d2) & (qidx >= 0)
    # winners valid -> their channels equal attrs[win]
    w = win[ok]
    fetched = np.stack([attr_out[:, ch, :][ok] for ch in range(4)], -1)
    np.testing.assert_allclose(fetched, attrs[w], rtol=1e-6)


def test_two_phase_exactness(rng):
    """Force a small l1 so phase 2 must fire, and check exact NN."""
    tgt = rng.uniform(size=(30000, 3)).astype(np.float32)
    q = rng.uniform(size=(4000, 3)).astype(np.float32)
    r = 0.12  # dense neighborhoods
    plan = packgrid.plan_packgrid(tgt, r, margin=0.0, exact=True)
    assert plan is not None
    l1 = 128
    if plan["kc"] <= l1:
        pytest.skip("kc too small to exercise two-phase")
    grid = packgrid.make_packgrid(
        jnp.asarray(tgt), jnp.zeros((tgt.shape[0], 1), jnp.float32),
        plan["origin"], plan["cell_size"], plan["dims"], plan["cap"],
        plan["kc"], l1)
    idx, d2 = packgrid.query_nn_packgrid(grid, jnp.asarray(q), r,
                                         plan["qcap"])
    np.testing.assert_array_equal(np.asarray(idx), brute_nn(q, tgt, r))


def test_rebin_margin_plan():
    pts = np.random.default_rng(0).uniform(size=(5000, 3)) \
        .astype(np.float32)
    plan = packgrid.plan_packgrid(pts, 0.05, margin=0.125)
    assert plan is not None
    assert abs(float(plan["cell_size"]) - 0.05 * 1.125) < 1e-6
    assert abs(float(plan["rebin_margin"]) - 0.05 * 0.125) < 1e-6


def test_two_phase_pallas_interpret(rng):
    """Run the actual Pallas kernel (interpret mode) with a small l1 so
    the phase-2 branch must fire, and compare against brute force."""
    tgt = rng.uniform(size=(8000, 3)).astype(np.float32)
    q = rng.uniform(size=(1200, 3)).astype(np.float32)
    r = 0.15
    plan = packgrid.plan_packgrid(tgt, r, margin=0.0, exact=True)
    assert plan is not None
    l1 = 128
    assert plan["kc"] > l1
    grid = packgrid.make_packgrid(
        jnp.asarray(tgt), jnp.zeros((tgt.shape[0], 1), jnp.float32),
        plan["origin"], plan["cell_size"], plan["dims"], plan["cap"],
        plan["kc"], l1)
    idx, d2 = packgrid.query_nn_packgrid(
        grid, jnp.asarray(q), r, plan["qcap"], use_pallas="interpret")
    np.testing.assert_array_equal(np.asarray(idx), brute_nn(q, tgt, r))


def test_packed_icp_matches_legacy(rng):
    """The fused packed ICP loop converges to the legacy path's
    transform on a noisy rigid pair."""
    from cupoch_tpu.geometry.pointcloud import PointCloud
    from cupoch_tpu.registration.registration import (
        ICPConvergenceCriteria, registration_icp, _GRID_THRESHOLD)
    from cupoch_tpu.registration.estimation import (
        TransformationEstimationPointToPlane,
        TransformationEstimationPointToPoint)

    n = _GRID_THRESHOLD + 5000  # force the packed path
    tgt = rng.uniform(size=(n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    ang = 0.015
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    src = (tgt - np.float32([0.008, -0.012, 0.004])) @ R

    target = PointCloud(tgt)
    target.normals = jnp.asarray(nrm)
    source = PointCloud(src)
    crit = ICPConvergenceCriteria(max_iteration=25)
    for est in (TransformationEstimationPointToPlane(),
                TransformationEstimationPointToPoint()):
        res = registration_icp(source, target, 0.06,
                               estimation=est, criteria=crit)
        assert res.fitness > 0.99
        assert res.inlier_rmse < 2e-3
        # recovered transform maps src back onto tgt
        T = res.transformation
        back = src @ T[:3, :3].T + T[:3, 3]
        err = np.linalg.norm(back - tgt, axis=1)
        assert np.percentile(err, 90) < 2e-3
