"""Isolate the fused kernel cost: one GN pass, gating on/off, vs rebin."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from cupoch_tpu.knn import rungrid
from cupoch_tpu.registration import fused_icp
from cupoch_tpu.registration.estimation import TransformationEstimationType

N = M = 1_000_000
rng = np.random.default_rng(0)
tgt = rng.uniform(size=(M, 3)).astype(np.float32) * 2.0
tn = rng.normal(size=(M, 3)).astype(np.float32)
tn /= np.linalg.norm(tn, axis=1, keepdims=True)
src = tgt - np.float32([0.005, -0.004, 0.002])

tgt_j = jnp.asarray(tgt); tn_j = jnp.asarray(tn); src_j = jnp.asarray(src)
mask = jnp.ones(N, bool)
est = TransformationEstimationType.PointToPlane
attrs, est_code = fused_icp.make_target_attrs(est, tgt_j, tn_j)
plan = rungrid.plan_rungrid(tgt, 0.05, margin=0.125, query_points=src)
print({k: v for k, v in plan.items() if k != "origin"}, flush=True)
grid = rungrid.make_rungrid(tgt_j, attrs, plan["origin"], plan["cell_size"],
                            plan["dims"], plan["cap"], mask=mask,
                            est=est_code)
_ = float(jnp.sum(grid.bounds[:1]))

qsoa, qidx = rungrid.bin_queries(src_j, src_j, grid.origin, grid.cell_size,
                                 grid.dims, plan["qcap"], mask=mask)
_ = float(jnp.sum(qsoa[:1, :1, :1]))
T_id = jnp.eye(4, dtype=jnp.float32)
params = rungrid.make_params(T_id, jnp.float32(0.05) ** 2, grid)

def timeit(name, fn, *a, n=5):
    out = fn(*a)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
        ts.append(time.perf_counter() - t0)
    print(f"{name:32s} {min(ts)*1e3:8.2f} ms", flush=True)

# converged-state GN pass (identity transform, src==tgt-ish)
timeit("GN pass (gated)", lambda g, q, qi, p: rungrid.fused_query(
    g, q, qi, p, rungrid.EST_PT2PL, False), grid, qsoa, qidx, params)

# gating disabled: bounds = -inf so every window always runs
grid_ng = rungrid.RunGrid(grid.cand, grid.attrp, grid.negidx,
                          jnp.full_like(grid.bounds, -np.inf),
                          grid.pack_lohi, grid.origin, grid.cell_size,
                          grid.dims, grid.cap, grid.kc, grid.est)
timeit("GN pass (no gating)", lambda g, q, qi, p: rungrid.fused_query(
    g, q, qi, p, rungrid.EST_PT2PL, False), grid_ng, qsoa, qidx, params)

# corres pass
timeit("corres pass (gated)", lambda g, q, qi, p: rungrid.fused_query(
    g, q, qi, p, rungrid.EST_NONE, True), grid, qsoa, qidx, params)

# rebin
timeit("bin_queries", lambda s, m: rungrid.bin_queries(
    s, s, grid.origin, grid.cell_size, grid.dims, plan["qcap"], mask=m),
    src_j, mask)

# far-from-converged transform (more windows needed)
ang = 0.02
Rm = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                 [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
T_far = jnp.asarray(np.block([[Rm, np.float32([[0.01], [-0.02], [0.005]])],
                              [np.zeros((1, 3), np.float32), np.ones((1, 1), np.float32)]]))
params_far = rungrid.make_params(T_far, jnp.float32(0.05) ** 2, grid)
timeit("GN pass (gated, far T)", lambda g, q, qi, p: rungrid.fused_query(
    g, q, qi, p, rungrid.EST_PT2PL, False), grid, qsoa, qidx, params_far)
