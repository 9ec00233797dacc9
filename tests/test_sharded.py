"""Cell-sharded (ring) multi-chip ICP vs the single-device pool path.

The ring path (parallel/sharded.py ring_sharded_registration_icp,
fused_icp.icp_core_pool_ring) shards the pooled grid's score table by
supertile across the mesh and rotates it with ppermute; results must
match the replicated single-device loop bit-for-practical purposes
(VERDICT r3 item 5). Runs on the 8-virtual-device CPU mesh from
tests/conftest.py."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cupoch_tpu.knn import poolgrid
from cupoch_tpu.parallel import (
    make_point_mesh,
    ring_sharded_registration_icp,
)
from cupoch_tpu.registration import fused_icp
from cupoch_tpu.registration.estimation import (
    TransformationEstimationType,
)


def _pair(rng, m):
    tgt = (rng.uniform(size=(m, 3))).astype(np.float32)
    tn = rng.normal(size=(m, 3)).astype(np.float32)
    tn /= np.linalg.norm(tn, axis=1, keepdims=True)
    ang = 0.015
    R = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0],
                    [0, 0, 1]], np.float32)
    t = np.float32([0.004, -0.006, 0.002])
    src = (tgt - t) @ R
    Tgt = np.eye(4, dtype=np.float32)
    Tgt[:3, :3] = R
    Tgt[:3, 3] = t
    return tgt, tn, src, Tgt


def test_ring_icp_matches_single(rng):
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    m = 20000
    tgt, tn, src, Tgt = _pair(rng, m)
    mesh = make_point_mesh()
    D = mesh.devices.size

    T, fit, rmse, it, _ = ring_sharded_registration_icp(
        src, tgt, tn, 0.05, mesh, max_iteration=20)
    assert fit > 0.99
    assert np.abs(T - Tgt).max() < 5e-4

    # single-device pool path on the same data
    est = TransformationEstimationType.PointToPlane
    tgt_j = jnp.asarray(tgt)
    attrs, est_code = fused_icp.make_target_attrs(
        est, tgt_j, jnp.asarray(tn))
    plan = poolgrid.plan_poolgrid(tgt, 0.05, query_points=src,
                                  est=est_code)
    grid = poolgrid.make_poolgrid(
        tgt_j, attrs, plan["origin"], plan["cell_size"], plan["dims"],
        plan["cap"], plan["kc"], est=est_code, tile=plan["tile"])
    Ts, _, fits, rmses, _, _ = fused_icp.icp_core_pool(
        jnp.asarray(src), jnp.ones(m, bool),
        jnp.zeros((m, 0), jnp.float32), grid,
        jnp.eye(4, dtype=jnp.float32), jnp.float32(0.05),
        plan["rebin_margin"], jnp.float32(1e-6), jnp.float32(1e-6),
        plan["qp"], est, 20)
    assert np.abs(T - np.asarray(Ts)).max() < 1e-3
    assert abs(fit - float(fits)) < 5e-3


def test_ring_shard_plan_divisibility(rng):
    tgt = rng.uniform(size=(5000, 3)).astype(np.float32)
    plan = poolgrid.plan_poolgrid(tgt, 0.05, shards=8)
    assert plan is not None
    C = plan["dims"][0] * plan["dims"][1] * plan["dims"][2]
    c_pad = -(-C // (plan["tile"] * 8)) * (plan["tile"] * 8)
    assert c_pad % (plan["tile"] * 8) == 0
    grid = poolgrid.make_poolgrid(
        jnp.asarray(tgt), jnp.zeros((5000, 0), jnp.float32),
        plan["origin"], plan["cell_size"], plan["dims"], plan["cap"],
        plan["kc"], tile=plan["tile"], shards=8)
    assert grid.scan.shape[0] == (c_pad // plan["tile"]) * plan["kc"]
    assert grid.n_tiles % 8 == 0
