"""Measure XLA primitive costs on TPU: sort variants, scatter, gather."""
import time
import numpy as np
import jax
import jax.numpy as jnp

N = 1_000_000
C = 54912
CAP = 40
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
ch = [jnp.asarray(rng.uniform(size=N).astype(np.float32)) for _ in range(8)]
pos = jnp.arange(N, dtype=jnp.int32)

def timeit(name, fn, *args, n=5):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jax.device_get(leaf.ravel()[:1]))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(jax.device_get(leaf.ravel()[:1]))
        ts.append(time.perf_counter() - t0)
    print(f"{name:36s} {min(ts)*1e3:8.2f} ms", flush=True)
    return out

@jax.jit
def sort2(k, p):
    return jax.lax.sort((k, p), num_keys=1, is_stable=True)

@jax.jit
def sort5(k, p, a, b, c):
    return jax.lax.sort((k, p, a, b, c), num_keys=1, is_stable=True)

@jax.jit
def sort9(k, p, a, b, c, d, e, f, g):
    return jax.lax.sort((k, p, a, b, c, d, e, f, g), num_keys=1, is_stable=True)

timeit("sort 1M (key+idx)", sort2, keys, pos)
timeit("sort 1M (key+4)", sort5, keys, pos, *ch[:3])
timeit("sort 1M (key+8)", sort9, keys, pos, *ch[:7])

slot = jnp.asarray(rng.permutation(C * CAP)[:N].astype(np.int32))

@jax.jit
def scatter1(s, v):
    return jnp.zeros(C * CAP, jnp.float32).at[s].set(v, mode="drop")

@jax.jit
def scatter4(s, a, b, c, d):
    out = jnp.zeros((C * CAP, 4), jnp.float32)
    return out.at[s].set(jnp.stack([a, b, c, d], -1), mode="drop")

timeit("scatter 1M -> 2.2M rows (1ch)", scatter1, slot, ch[0])
timeit("scatter 1M -> 2.2M rows (4ch row)", scatter4, slot, *ch[:4])

gidx = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
tbl3 = jnp.stack(ch[:3], -1)

@jax.jit
def gather3(i, t):
    return t[i]

timeit("gather 1M rows x3ch", gather3, gidx, tbl3)

@jax.jit
def scatter_add(s):
    return jnp.zeros(C, jnp.int32).at[s].add(1, mode="drop")

timeit("scatter-add 1M -> 55k (counts)", scatter_add, keys)

# segment rank via sorted associative scan (current approach cost)
@jax.jit
def seg_rank(k, p):
    ks, order = jax.lax.sort((k, p), num_keys=1, is_stable=True)
    boundary = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]])
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(boundary, p, 0))
    return p - seg_start

timeit("sort+scan rank", seg_rank, keys, pos)

# VPU throughput probe: big elementwise fma chain over [2.6M, 128]
x = jnp.asarray(rng.uniform(size=(54912*48, 128)).astype(np.float32))

@jax.jit
def fma8(x):
    y = x
    for i in range(8):
        y = y * 1.0001 + 0.5
    return jnp.min(y, -1)

timeit("VPU 8-op chain over 337M elems", fma8, x)
