"""Multi-device scaling benchmark
(BASELINE.md: report frames/s scaling efficiency at 1 chip / 1 host /
N hosts; ≥80% at 2+ hosts is the target).

Measures the PRODUCTION fused multi-iteration ICP loop
(parallel.sharded_registration_icp: run-grid correspondence + in-kernel
GN per shard, one psum of 32 floats per iteration) at growing device
counts, weak-scaling (constant source points per device against a
fixed target map), reporting throughput and efficiency vs the
single-device run.  On CPU use
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` to validate the
harness; on a TPU slice the same code paths ride ICI.
Run: ``python -m cupoch_tpu.bench.scaling [--points N]``.
"""
from __future__ import annotations

import json
from typing import List

import numpy as np


def run_scaling(points_per_device: int = 131072, reps: int = 2,
                max_iteration: int = 8) -> List[dict]:
    import jax

    from ..parallel import make_point_mesh, sharded_registration_icp

    devices = jax.devices()
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= len(devices)]
    rng = np.random.default_rng(0)
    M = 262144
    tgt = rng.uniform(size=(M, 3)).astype(np.float32)
    tgt_normals = rng.normal(size=(M, 3)).astype(np.float32)
    tgt_normals /= np.linalg.norm(tgt_normals, axis=1, keepdims=True)
    ang = 0.01
    R = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
                   np.float32)

    results = []
    base_tput = None
    for c in counts:
        mesh = make_point_mesh(c)
        # weak scaling: constant work per device; sources sample the
        # target with a rigid offset so the solve is realistic
        N = points_per_device * c
        sel = rng.integers(0, M, N)
        src = (tgt[sel] - np.float32([0.005, -0.004, 0.002])) @ R
        best = float("inf")
        fit = rmse = 0.0
        it = 0
        for _ in range(reps):
            T, fit, rmse, it, dt = sharded_registration_icp(
                src, tgt, tgt_normals, 0.03, mesh,
                max_iteration=max_iteration)
            best = min(best, dt)
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
            "fitness": round(fit, 5),
            "rmse": round(rmse, 6),
            "iterations": it,
        })
    return results


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--points", type=int, default=131072,
                    help="points per device (weak scaling)")
    ap.add_argument("--iters", type=int, default=8,
                    help="ICP iterations per measurement")
    args = ap.parse_args(argv)
    for r in run_scaling(args.points, max_iteration=args.iters):
        print(json.dumps(r))


if __name__ == "__main__":
    main()
