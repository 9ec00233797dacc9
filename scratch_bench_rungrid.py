"""Time rungrid fused ICP @1M on the real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from cupoch_tpu.knn import rungrid
from cupoch_tpu.registration import fused_icp
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

src_j = jnp.asarray(src); tgt_j = jnp.asarray(tgt); tn_j = jnp.asarray(tn)
mask = jnp.ones(N, bool)
T0 = jnp.eye(4, dtype=jnp.float32)
est = TransformationEstimationType.PointToPlane
attrs, plane_offset = fused_icp.make_target_attrs(est, tgt_j, tn_j)

for margin in (0.125, 0.25, 0.5):
    t0 = time.perf_counter()
    plan = rungrid.plan_rungrid(tgt, 0.05, margin=margin, query_points=src)
    print(f"margin={margin} plan {time.perf_counter()-t0:.2f}s",
          {k: v for k, v in plan.items() if k != "origin"}, flush=True)

    def build():
        return rungrid.make_rungrid(
            tgt_j, attrs, plan["origin"], plan["cell_size"],
            plan["dims"], plan["cap"], mask=mask,
            plane_offset=plane_offset)

    def run(grid):
        return fused_icp.icp_core_rungrid(
            src_j, mask, jnp.zeros_like(src_j), grid, T0,
            jnp.float32(0.05), plan["rebin_margin"],
            jnp.float32(REL_TOL), jnp.float32(REL_TOL),
            plan["qcap"], est, ITERS)

    grid = build()
    _ = float(jnp.sum(grid.bounds[:1]))
    print("  grid MB", (grid.cand.nbytes + grid.attr.nbytes) / 1e6, flush=True)
    T, idx, fit, rmse, it = run(grid)
    print("  fit", float(fit), "rmse", float(rmse), "it", int(it), flush=True)
    for trial in range(3):
        t0 = time.perf_counter()
        grid = build()
        _ = float(jnp.sum(grid.bounds[:1]))
        tb = time.perf_counter() - t0
        t0 = time.perf_counter()
        T, idx, fit, rmse, it = run(grid)
        _ = float(fit)
        tr = time.perf_counter() - t0
        print(f"  build {tb*1e3:7.1f} ms  loop {tr*1e3:7.1f} ms  "
              f"fps {1.0/(tb+tr):6.3f}", flush=True)
