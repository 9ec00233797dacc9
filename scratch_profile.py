"""Scratch: per-phase timing of the packed ICP pipeline on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from cupoch_tpu.knn import packgrid
from cupoch_tpu.registration import packed_icp
from cupoch_tpu.registration.estimation import TransformationEstimationType

N = M = 1_000_000
rng = np.random.default_rng(0)
tgt = rng.uniform(size=(M, 3)).astype(np.float32) * 2.0
tn = rng.normal(size=(M, 3)).astype(np.float32)
tn /= np.linalg.norm(tn, axis=1, keepdims=True)
src = tgt.copy()

tgt_j = jnp.asarray(tgt)
tn_j = jnp.asarray(tn)
src_j = jnp.asarray(src)
mask = jnp.ones(N, bool)

est = TransformationEstimationType.PointToPlane
attrs, nch = packed_icp.make_target_attrs(est, tgt_j, tn_j)
plan = packgrid.plan_packgrid(tgt, 0.05, query_points=src, nch=nch)
print({k: v for k, v in plan.items() if k != "origin"})

grid = packgrid.make_packgrid(
    tgt_j, attrs, plan["origin"], plan["cell_size"], plan["dims"],
    plan["cap"], plan["kc"], plan["l1"], mask=mask)
jax.block_until_ready(grid.cand)
cp = grid.cand.shape[0]
print("Cp", cp, "cand MB", grid.cand.nbytes / 1e6, "attr MB", grid.attr.nbytes / 1e6)

def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {min(ts)*1e3:8.2f} ms")
    return out

# 1. query binning (the rebin cost)
bq = jax.jit(lambda: packgrid.bin_queries(
    src_j, src_j, grid.origin, grid.cell_size, grid.dims, plan["qcap"],
    mask=mask))
qsoa, _, qidx = timeit("bin_queries (rebin)", bq)

centers = packgrid._cell_centers(grid.dims, grid.origin, grid.cell_size, cp)
T_id = jnp.eye(4, dtype=jnp.float32)

# 2. prep (transform pass)
pq = jax.jit(lambda q: packgrid.prep_queries(q, T_id, centers))
q8 = timeit("prep_queries", pq, qsoa)

# 3. the Pallas query kernel
qk = jax.jit(lambda q: packgrid.query_packed(grid, q, jnp.float32(0.05)))
d2, attr_out = timeit("query kernel (phase2 hot)", qk, q8)

# phase-1-only: same grid but force l1 = kc (single phase over full KC)
grid1 = packgrid.PackGrid(grid.cand, grid.attr,
                          jnp.full_like(grid.dbound, np.inf),
                          grid.origin, grid.cell_size, grid.dims,
                          grid.cap, grid.kc, grid.kc, grid.nch)
qk1 = jax.jit(lambda q: packgrid.query_packed(grid1, q, jnp.float32(0.05)))
timeit("query kernel (full KC 1ph)", qk1, q8)

# 4. GN reduce from bin-order arrays
K = cp * plan["qcap"]
def gn(q8_, attr_, d2_):
    q_t = jnp.moveaxis(q8_[:, 0:3, :], 1, 2).reshape(K, 3)
    attr_f = jnp.moveaxis(attr_, 1, 2).reshape(K, -1)
    w = jnp.isfinite(d2_).astype(jnp.float32).reshape(K)
    return packed_icp._estimator_update(est, q_t, None, attr_f, w)
timeit("GN estimator update", jax.jit(gn), q8, attr_out, d2)

# 5. grid build phases
bb = jax.jit(lambda: packgrid.build_packgrid(
    tgt_j, attrs, grid.origin, grid.cell_size, grid.dims,
    plan["cap"], plan["kc"], mask=mask))
timeit("build_packgrid (full)", bb, n=3)
