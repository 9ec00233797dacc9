"""FilterReg GMM registration tests
(reference model: filterreg.cu convergence behavior)."""
import numpy as np
import pytest

from cupoch_tpu.geometry import PointCloud
from cupoch_tpu.registration import (
    FilterRegOption,
    registration_filterreg,
)


def make_pair(rng, n=400, angle=0.05, t=(0.02, -0.03, 0.01)):
    tgt = rng.uniform(size=(n, 3)).astype(np.float32)
    R = np.asarray([
        [np.cos(angle), -np.sin(angle), 0],
        [np.sin(angle), np.cos(angle), 0],
        [0, 0, 1],
    ], np.float32)
    # row convention: src = (tgt - t) @ R  <=>  tgt = R @ src + t (cols)
    src = (tgt - np.asarray(t, np.float32)) @ R
    return PointCloud(src), PointCloud(tgt), R, np.asarray(t, np.float32)


def test_recovers_small_motion(rng):
    src, tgt, R_true, t_true = make_pair(rng)
    res = registration_filterreg(src, tgt,
                                 option=FilterRegOption(sigma_initial=0.05))
    T = res.transformation
    np.testing.assert_allclose(T[:3, :3], R_true, atol=0.02)
    np.testing.assert_allclose(T[:3, 3], t_true, atol=0.02)


def test_alignment_error_decreases(rng):
    src, tgt, _, _ = make_pair(rng, angle=0.1, t=(0.05, 0.0, -0.05))
    res = registration_filterreg(src, tgt,
                                 option=FilterRegOption(sigma_initial=0.1))
    moved = PointCloud(np.asarray(src.points))
    moved.transform(res.transformation)
    # nearest-neighbor RMS after registration must beat before
    from cupoch_tpu.knn.bruteforce import knn_search

    def rms(a, b):
        _, d2 = knn_search(np.asarray(a.points), np.asarray(b.points), 1)
        return float(np.sqrt(np.mean(np.asarray(d2)[:, 0])))

    assert rms(moved, tgt) < 0.3 * rms(src, tgt)


def test_identity_stays_identity(rng):
    pts = rng.uniform(size=(200, 3)).astype(np.float32)
    res = registration_filterreg(PointCloud(pts), PointCloud(pts))
    np.testing.assert_allclose(res.transformation, np.eye(4), atol=5e-3)


def test_empty_raises():
    with pytest.raises(RuntimeError):
        registration_filterreg(PointCloud(), PointCloud())


def test_grid_estep_matches_dense(rng):
    """The run-grid truncated-Gaussian E-step agrees with the dense
    O(N*M) transform for radii covering the significant weights."""
    import jax.numpy as jnp

    from cupoch_tpu.knn import rungrid as rg
    from cupoch_tpu.registration.filterreg import _gaussian_moments

    tgt = rng.uniform(size=(1500, 3)).astype(np.float32)
    q = rng.uniform(size=(400, 3)).astype(np.float32)
    sigma = 0.05
    trunc = 4.0 * sigma
    inv_2s2 = 1.0 / (2.0 * sigma * sigma)

    m0_d, m1_d, m2_d = _gaussian_moments(
        jnp.asarray(q), jnp.asarray(tgt),
        jnp.ones(len(tgt), bool), jnp.float32(inv_2s2))

    plan = rg.plan_rungrid(tgt, trunc, margin=0.0)
    grid = rg.make_rungrid(jnp.asarray(tgt),
                           jnp.zeros((len(tgt), 0), jnp.float32),
                           plan["origin"], plan["cell_size"],
                           plan["dims"], plan["cap"])
    qsoa, qidx = rg.bin_queries(jnp.asarray(q), jnp.asarray(q),
                                grid.origin, grid.cell_size, grid.dims,
                                plan["qcap"])
    params = rg.make_params(jnp.eye(4, dtype=jnp.float32),
                            jnp.float32(trunc) ** 2, grid,
                            inv_2s2=jnp.float32(inv_2s2))
    m0, M1, M2 = rg.gmm_moments(grid, qsoa, qidx, params)

    # scatter back to query order
    flat_q = np.asarray(qidx).reshape(-1)
    okq = flat_q >= 0
    m0_g = np.zeros(len(q), np.float32)
    m0_g[flat_q[okq]] = np.asarray(m0).reshape(-1)[okq]
    m1_g = np.zeros((len(q), 3), np.float32)
    m1_g[flat_q[okq]] = np.asarray(M1).reshape(-1, 3)[okq]
    m2_g = np.zeros(len(q), np.float32)
    m2_g[flat_q[okq]] = np.asarray(M2).reshape(-1)[okq]

    # truncation at 4 sigma keeps >= 99.97% of the Gaussian mass
    # (per-point tail error up to ~0.5% for boundary queries)
    np.testing.assert_allclose(m0_g, np.asarray(m0_d), rtol=8e-3,
                               atol=8e-3)
    np.testing.assert_allclose(m1_g, np.asarray(m1_d), rtol=8e-3,
                               atol=8e-3)
    np.testing.assert_allclose(m2_g, np.asarray(m2_d), rtol=8e-3,
                               atol=1.5e-2)


def test_grid_filterreg_converges(rng):
    """The grid-backed EM loop recovers a small rigid offset (driven
    directly; the public API engages it above the dense threshold)."""
    import jax.numpy as jnp

    from cupoch_tpu.knn import rungrid as rg
    from cupoch_tpu.registration.filterreg import _filterreg_core_grid

    n = 3000
    tgt = rng.uniform(size=(n, 3)).astype(np.float32)
    t_true = np.float32([0.02, -0.015, 0.01])
    src = tgt - t_true
    sigma0 = 0.08
    trunc = 3.0 * sigma0
    plan = rg.plan_rungrid(tgt, trunc, margin=0.25, query_points=src)
    grid = rg.make_rungrid(jnp.asarray(tgt),
                           jnp.zeros((n, 0), jnp.float32),
                           plan["origin"], plan["cell_size"],
                           plan["dims"], plan["cap"])
    T, lik = _filterreg_core_grid(
        jnp.asarray(src), jnp.ones(n, bool), grid,
        jnp.eye(4, dtype=jnp.float32), jnp.float32(sigma0),
        jnp.float32(1e-4), jnp.float32(1e-6), jnp.float32(trunc),
        plan["rebin_margin"], plan["qcap"], 30)
    T = np.asarray(T)
    np.testing.assert_allclose(T[:3, 3], t_true, atol=4e-3)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=4e-3)


def test_gmm_kernel_interpret_parity(rng):
    """The Pallas GMM kernel (rungrid.py:_make_gmm_kernel) must match
    the XLA fallback exactly in interpret mode (VERDICT r3 item 10:
    the kernel previously first ran on real TPU with no parity
    check)."""
    import jax.numpy as jnp
    from cupoch_tpu.knn import rungrid as rg

    tgt = rng.uniform(size=(1500, 3)).astype(np.float32)
    q = rng.uniform(size=(300, 3)).astype(np.float32)
    sigma = 0.05
    trunc = 4.0 * sigma
    inv_2s2 = 1.0 / (2.0 * sigma * sigma)
    plan = rg.plan_rungrid(tgt, trunc, margin=0.0)
    grid = rg.make_rungrid(jnp.asarray(tgt),
                           jnp.zeros((len(tgt), 0), jnp.float32),
                           plan["origin"], plan["cell_size"],
                           plan["dims"], plan["cap"])
    qsoa, qidx = rg.bin_queries(jnp.asarray(q), jnp.asarray(q),
                                grid.origin, grid.cell_size, grid.dims,
                                plan["qcap"])
    params = rg.make_params(jnp.eye(4, dtype=jnp.float32),
                            jnp.float32(trunc) ** 2, grid,
                            inv_2s2=jnp.float32(inv_2s2))
    ref = rg.gmm_moments(grid, qsoa, qidx, params, use_pallas=False)
    got = rg.gmm_moments(grid, qsoa, qidx, params,
                         use_pallas="interpret")
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-5)
