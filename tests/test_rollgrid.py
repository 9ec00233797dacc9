"""Dense roll-grid NN tests (XLA fallback path; the Pallas kernel is
exercised on TPU and validated to match this path exactly)."""
import numpy as np
import pytest

import jax.numpy as jnp

from cupoch_tpu.knn import bruteforce, rollgrid


def brute_nn(q, tgt, r):
    bidx, bd2 = bruteforce.nn_search(jnp.asarray(q), jnp.asarray(tgt))
    return np.where(np.asarray(bd2) <= r * r, np.asarray(bidx), -1)


def build(tgt, r, **kw):
    plan = rollgrid.plan_rollgrid(tgt, r, **kw)
    assert plan is not None
    return rollgrid.build_rollgrid(
        jnp.asarray(tgt), jnp.asarray(plan["origin"]), plan["cell_size"],
        plan["dims"], plan["cap"])


def test_matches_brute_force(rng):
    tgt = rng.uniform(size=(4000, 3)).astype(np.float32)
    q = rng.uniform(size=(2500, 3)).astype(np.float32)
    r = 0.06
    grid = build(tgt, r)
    idx, d2 = rollgrid.query_nn_rollgrid(grid, jnp.asarray(q), r)
    np.testing.assert_array_equal(np.asarray(idx), brute_nn(q, tgt, r))


def test_queries_outside_grid(rng):
    tgt = rng.uniform(size=(1000, 3)).astype(np.float32)
    grid = build(tgt, 0.1)
    q = rng.uniform(size=(100, 3)).astype(np.float32) + 50.0
    idx, d2 = rollgrid.query_nn_rollgrid(grid, jnp.asarray(q), 0.1)
    assert (np.asarray(idx) == -1).all()
    assert np.isinf(np.asarray(d2)).all()


def test_query_mask(rng):
    tgt = rng.uniform(size=(1000, 3)).astype(np.float32)
    grid = build(tgt, 0.1)
    q = tgt[:50]
    mask = np.zeros(50, bool)
    mask[::2] = True
    idx, _ = rollgrid.query_nn_rollgrid(grid, jnp.asarray(q), 0.1,
                                        query_mask=jnp.asarray(mask))
    idx = np.asarray(idx)
    assert (idx[::2] >= 0).all()
    assert (idx[1::2] == -1).all()


def test_self_query_identity(rng):
    tgt = rng.uniform(size=(3000, 3)).astype(np.float32)
    grid = build(tgt, 0.05)
    idx, d2 = rollgrid.query_nn_rollgrid(grid, jnp.asarray(tgt), 0.05)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(3000))
    np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-9)


def test_plan_rejects_degenerate():
    pts = np.full((10, 3), np.nan, np.float32)
    assert rollgrid.plan_rollgrid(pts, 0.1) is None
    pts2 = np.zeros((10, 3), np.float32)
    assert rollgrid.plan_rollgrid(pts2, 0.0) is None
    # huge extent vs tiny radius -> too many cells
    pts3 = np.asarray([[0, 0, 0], [1e6, 1e6, 1e6]], np.float32)
    assert rollgrid.plan_rollgrid(pts3, 0.001) is None


def test_cap_drops_overflow_only(rng):
    # 2000 coincident-cell points with cap percentile forcing overflow
    tgt = np.concatenate([
        np.full((200, 3), 0.5, np.float32)
        + rng.normal(0, 0.001, (200, 3)).astype(np.float32),
        rng.uniform(size=(800, 3)).astype(np.float32),
    ])
    plan = rollgrid.plan_rollgrid(tgt, 0.05, cap_percentile=50.0)
    grid = rollgrid.build_rollgrid(
        jnp.asarray(tgt), jnp.asarray(plan["origin"]), plan["cell_size"],
        plan["dims"], plan["cap"])
    q = rng.uniform(size=(500, 3)).astype(np.float32)
    idx, d2 = rollgrid.query_nn_rollgrid(grid, jnp.asarray(q), 0.05)
    idx = np.asarray(idx)
    # results that ARE returned must be true neighbors within r
    ok = idx >= 0
    d = np.linalg.norm(q[ok] - tgt[idx[ok]], axis=1)
    assert (d <= 0.05 + 1e-6).all()


def test_icp_uses_rollgrid_large_cloud(rng):
    """End-to-end: registration_icp on a >20k cloud goes through the
    roll-grid backend and still recovers the motion."""
    from cupoch_tpu.geometry import PointCloud
    from cupoch_tpu.registration import registration_icp

    tgt_pts = rng.uniform(size=(30000, 3)).astype(np.float32)
    t = np.asarray([0.01, -0.008, 0.005], np.float32)
    src_pts = tgt_pts - t
    res = registration_icp(PointCloud(src_pts), PointCloud(tgt_pts), 0.05)
    np.testing.assert_allclose(res.transformation[:3, 3], t, atol=2e-3)
    assert res.fitness > 0.95
