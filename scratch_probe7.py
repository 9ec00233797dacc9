"""Tile-size sweep + fetch isolation for the single-pass kernel."""
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
grid = rungrid.make_rungrid(tgt_j, attrs, plan["origin"], plan["cell_size"],
                            plan["dims"], plan["cap"], mask=mask, est=est_code)
_ = float(jnp.sum(grid.bounds[:1]))
qsoa, qidx = rungrid.bin_queries(src_j, src_j, grid.origin, grid.cell_size,
                                 grid.dims, plan["qcap"], mask=mask)
_ = float(jnp.sum(qsoa[:1, :1, :1]))
T_id = jnp.eye(4, dtype=jnp.float32)
params = rungrid.make_params(T_id, jnp.float32(0.05) ** 2, grid)

def timeit(name, fn, *a, n=4):
    try:
        out = fn(*a)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
    except Exception as e:
        print(f"{name:32s} FAIL {str(e)[:90]}", flush=True)
        return
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
        ts.append(time.perf_counter() - t0)
    print(f"{name:32s} {min(ts)*1e3:8.2f} ms", flush=True)

for t in (8, 16, 32, 64):
    timeit(f"GN pass T={t}", lambda g, q, qi, p, tt=t: rungrid.fused_query(
        g, q, qi, p, rungrid.EST_PT2PL, False, tile=tt),
        grid, qsoa, qidx, params)

# fetch isolation: EST_PT2PT has P=2 but grid built for pt2plane has its
# own P=2; score-only = corres with... corres fetches negidx. Build an
# EST_NONE grid (P=0): GN mode unavailable; measure corres (1 acc).
for t in (16, 32, 64):
    timeit(f"corres T={t}", lambda g, q, qi, p, tt=t: rungrid.fused_query(
        g, q, qi, p, rungrid.EST_NONE, True, tile=tt),
        grid, qsoa, qidx, params)
