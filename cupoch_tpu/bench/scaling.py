"""Multi-device scaling benchmark
(BASELINE.md: report frames/s scaling efficiency at 1 chip / 1 host /
N hosts; ≥80% at 2+ hosts is the target).

Measures the point-sharded ICP step (parallel.sharded_icp_step — psum
of the 6x6 GN system is the only collective) at growing device counts
on whatever mesh is available, reporting throughput and efficiency vs
the single-device run. On CPU use
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` to validate the
harness; on a TPU slice the same code paths ride ICI.
Run: ``python -m cupoch_tpu.bench.scaling [--points N]``.
"""
from __future__ import annotations

import json
import time
from typing import List

import numpy as np


def run_scaling(points_per_device: int = 131072, reps: int = 3
                ) -> List[dict]:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import POINTS_AXIS, make_point_mesh, sharded_icp_step

    devices = jax.devices()
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= len(devices)]
    rng = np.random.default_rng(0)
    M = 65536
    tgt = jnp.asarray(rng.uniform(size=(M, 3)), jnp.float32)
    tgt_normals_np = rng.normal(size=(M, 3)).astype(np.float32)
    tgt_normals_np /= np.linalg.norm(tgt_normals_np, axis=1, keepdims=True)
    tgt_normals = jnp.asarray(tgt_normals_np)
    tgt_mask = jnp.ones((M,), bool)
    T0 = jnp.eye(4, dtype=jnp.float32)

    results = []
    base_tput = None
    for c in counts:
        mesh = make_point_mesh(c)
        # weak scaling: constant work per device
        N = points_per_device * c
        src = jnp.asarray(rng.uniform(size=(N, 3)), jnp.float32)
        src_mask = jnp.ones((N,), bool)
        sharding = NamedSharding(mesh, P(POINTS_AXIS))
        src = jax.device_put(src, sharding)
        src_mask = jax.device_put(src_mask, sharding)
        step = sharded_icp_step(mesh)

        def run():
            T, fit, rmse = step(src, src_mask, tgt, tgt_mask,
                                tgt_normals, T0)
            return float(fit)  # host transfer forces completion

        run()  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        tput = N / best
        if base_tput is None:
            base_tput = tput / c
        eff = tput / (base_tput * c)
        results.append({
            "devices": c,
            "points": N,
            "seconds": round(best, 5),
            "points_per_s": round(tput),
            "efficiency": round(eff, 3),
        })
    return results


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--points", type=int, default=131072,
                    help="points per device (weak scaling)")
    args = ap.parse_args(argv)
    for r in run_scaling(args.points):
        print(json.dumps(r))


if __name__ == "__main__":
    main()
