"""Single-pass kernel probe + full fused-ICP frame timing."""
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
ang = 0.02
R = np.asarray([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
src = (tgt - np.float32([0.01, -0.02, 0.005])) @ R

tgt_j = jnp.asarray(tgt); tn_j = jnp.asarray(tn); src_j = jnp.asarray(src)
mask = jnp.ones(N, bool)
est = TransformationEstimationType.PointToPlane
attrs, est_code = fused_icp.make_target_attrs(est, tgt_j, tn_j)
plan = rungrid.plan_rungrid(tgt, 0.05, margin=0.125, query_points=src)
print({k: v for k, v in plan.items() if k != "origin"}, flush=True)
grid = rungrid.make_rungrid(tgt_j, attrs, plan["origin"], plan["cell_size"],
                            plan["dims"], plan["cap"], mask=mask, est=est_code, kc=plan["kc"])
_ = float(jnp.sum(grid.bounds[:1]))
qsoa, qidx = rungrid.bin_queries(src_j, src_j, grid.origin, grid.cell_size,
                                 grid.dims, plan["qcap"], mask=mask)
_ = float(jnp.sum(qsoa[:1, :1, :1]))
T_id = jnp.eye(4, dtype=jnp.float32)
params = rungrid.make_params(T_id, jnp.float32(0.05) ** 2, grid)

def timeit(name, fn, *a, n=4):
    out = fn(*a)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
        ts.append(time.perf_counter() - t0)
    print(f"{name:32s} {min(ts)*1e3:8.2f} ms", flush=True)

timeit("GN pass", lambda g, q, qi, p: rungrid.fused_query(
    g, q, qi, p, rungrid.EST_PT2PL, False), grid, qsoa, qidx, params)
timeit("corres pass", lambda g, q, qi, p: rungrid.fused_query(
    g, q, qi, p, rungrid.EST_NONE, True), grid, qsoa, qidx, params)
timeit("grid build", lambda: rungrid.make_rungrid(
    tgt_j, attrs, plan["origin"], plan["cell_size"], plan["dims"],
    plan["cap"], mask=mask, est=est_code, kc=plan["kc"]), n=3)
timeit("bin_queries", lambda: rungrid.bin_queries(
    src_j, src_j, grid.origin, grid.cell_size, grid.dims, plan["qcap"],
    mask=mask), n=3)

# full frame at two margins
for margin in (0.125, 0.25):
    plan2 = rungrid.plan_rungrid(tgt, 0.05, margin=margin, query_points=src)
    def frame():
        g = rungrid.make_rungrid(tgt_j, attrs, plan2["origin"],
                                 plan2["cell_size"], plan2["dims"],
                                 plan2["cap"], mask=mask, est=est_code,
                                 kc=plan2["kc"])
        return fused_icp.icp_core_rungrid(
            src_j, mask, jnp.zeros_like(src_j), g, T_id,
            jnp.float32(0.05), plan2["rebin_margin"],
            jnp.float32(1e-6), jnp.float32(1e-6), plan2["qcap"], est, 20)
    out = frame(); _ = float(out[2])
    print(f"margin={margin} fit={float(out[2]):.5f} rmse={float(out[3]):.6f} it={int(out[4])}", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = frame(); _ = float(out[2])
        ts.append(time.perf_counter() - t0)
    print(f"margin={margin} frame {min(ts)*1e3:.1f} ms  fps {1/min(ts):.3f}", flush=True)
