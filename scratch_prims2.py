"""Measure XLA primitive costs on the v5e: sorts, gathers,
take_along_axis, scatter — the decisions for build/rebin design."""
import time
import numpy as np
import jax
import jax.numpy as jnp

def timeit(name, fn, *args, n=4):
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
    print(f"{name:40s} {min(ts)*1e3:8.2f} ms", flush=True)

N = 1_000_000
C = 54912
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, C * 64, N).astype(np.int32))
ch = [jnp.asarray(rng.uniform(size=N).astype(np.float32)) for _ in range(8)]
pos = jnp.arange(N, dtype=jnp.int32)

timeit("sort 1M key only", jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0]), keys)
timeit("sort 1M (key,pos)", jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)), keys, pos)
timeit("sort 1M (key+4ch)", jax.jit(lambda k, p, a, b, c: jax.lax.sort((k, p, a, b, c), num_keys=1)), keys, pos, *ch[:3])
timeit("sort 1M (key+7ch)", jax.jit(lambda k, p, a, b, c, d, e, f: jax.lax.sort((k, p, a, b, c, d, e, f), num_keys=1)), keys, pos, *ch[:6])

gidx = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
tbl1 = ch[0]
tbl3 = jnp.stack(ch[:3], -1)
timeit("gather 1M x 1ch (x[idx])", jax.jit(lambda i, t: t[i]), gidx, tbl1)
timeit("gather 1M x 3ch rows", jax.jit(lambda i, t: t[i]), gidx, tbl3)
gidx26 = jnp.asarray(rng.integers(0, N, 2_600_000).astype(np.int32))
timeit("gather 2.6M x 1ch", jax.jit(lambda i, t: t[i]), gidx26, tbl1)

# take_along_axis on [55k, 1080] rows (lane permutation apply)
M2 = jnp.asarray(rng.uniform(size=(C, 1080)).astype(np.float32))
P2 = jnp.asarray(np.argsort(rng.uniform(size=(C, 1080)), -1).astype(np.int32))
timeit("take_along_axis [55k,1080]", jax.jit(lambda a, i: jnp.take_along_axis(a, i, axis=1)), M2, P2)

# scatter 1M -> 2.2M
slot = jnp.asarray(rng.permutation(C * 40)[:N].astype(np.int32))
timeit("scatter 1M->2.2M 1ch", jax.jit(lambda s, v: jnp.zeros(C * 40, jnp.float32).at[s].set(v, mode="drop")), slot, ch[0])
timeit("scatter-add 1M->55k", jax.jit(lambda s: jnp.zeros(C, jnp.int32).at[s // 64].add(1, mode="drop")), keys)

# sort [55k, 1080] single-operand along lanes (lane-sort cost)
timeit("lane sort [55k,1080] 1op", jax.jit(lambda a: jax.lax.sort(a, dimension=1)), M2)
timeit("lane sort [55k,1080] 2op", jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1, dimension=1)), M2, P2)
