"""Scratch: time packed ICP @1M on the real TPU, per-phase breakdown."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from cupoch_tpu.knn import packgrid
from cupoch_tpu.registration import packed_icp
from cupoch_tpu.registration.estimation import TransformationEstimationType

N = M = 1_000_000
ITERS = 20
REL_TOL = 1e-6

rng = np.random.default_rng(0)
tgt = rng.uniform(size=(M, 3)).astype(np.float32) * 2.0
tn = rng.normal(size=(M, 3)).astype(np.float32)
tn /= np.linalg.norm(tn, axis=1, keepdims=True)
ang = 0.02
R = np.asarray([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
src = (tgt - np.float32([0.01, -0.02, 0.005])) @ R

src_j = jnp.asarray(src)
tgt_j = jnp.asarray(tgt)
tn_j = jnp.asarray(tn)
mask = jnp.ones(N, bool)
T0 = jnp.eye(4, dtype=jnp.float32)

est = TransformationEstimationType.PointToPlane
attrs, nch = packed_icp.make_target_attrs(est, tgt_j, tn_j)
t0 = time.perf_counter()
plan = packgrid.plan_packgrid(tgt, 0.05, query_points=src, nch=nch)
print("plan time", time.perf_counter() - t0, {k: v for k, v in plan.items() if k != "origin"})

def build():
    return packgrid.make_packgrid(
        tgt_j, attrs, plan["origin"], plan["cell_size"], plan["dims"],
        plan["cap"], plan["kc"], plan["l1"], mask=mask)

def run(grid):
    return packed_icp.icp_core_packed(
        src_j, mask, jnp.zeros_like(src_j), grid, T0, jnp.float32(0.05),
        plan["rebin_margin"], jnp.float32(REL_TOL), jnp.float32(REL_TOL),
        plan["qcap"], est, ITERS)

# warm
grid = build()
jax.block_until_ready(grid.cand)
T, idx, fit, rmse, it = run(grid)
print("fit", float(fit), "rmse", float(rmse), "it", int(it))

# timed: build
for trial in range(3):
    t0 = time.perf_counter()
    grid = build()
    _ = float(jnp.sum(grid.dbound[:1]))
    tb = time.perf_counter() - t0
    t0 = time.perf_counter()
    T, idx, fit, rmse, it = run(grid)
    _ = float(fit)
    tr = time.perf_counter() - t0
    print(f"build {tb*1e3:.1f} ms  loop {tr*1e3:.1f} ms  total {(tb+tr)*1e3:.1f} ms  fps {1.0/(tb+tr):.3f}")
