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


def collective_split(n_devices: int = None,
                     points_per_device: int = 16384,
                     max_iteration: int = 6, reps: int = 3) -> dict:
    """Separate collective cost from compute on an n-device mesh.

    Runs the SAME per-shard fused ICP body twice under shard_map: once
    with the psum/pmin/pmax collectives (the production path) and once
    with axis_name=None (every device solves its shard independently —
    identical per-shard compute, zero collectives). On a virtual CPU
    mesh every device shares the host's physical cores, so weak-
    scaling efficiency is structurally bounded by cores/devices; the
    ratio t_with / t_without isolates what the COLLECTIVES cost,
    which is the part that rides ICI on real hardware (VERDICT r4 #5:
    prove where the loss comes from)."""
    import os
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..knn import rungrid
    from ..parallel import make_point_mesh
    from ..parallel.sharded import POINTS_AXIS
    from ..registration import fused_icp
    from ..registration.estimation import TransformationEstimationType

    if n_devices is None:
        n_devices = len(jax.devices())
    mesh = make_point_mesh(n_devices)
    rng = np.random.default_rng(0)
    M = 65536
    tgt = rng.uniform(size=(M, 3)).astype(np.float32)
    tn = rng.normal(size=(M, 3)).astype(np.float32)
    tn /= np.linalg.norm(tn, axis=1, keepdims=True)
    N = points_per_device * n_devices
    sel = rng.integers(0, M, N)
    src = tgt[sel] - np.float32([0.004, -0.003, 0.002])

    est = TransformationEstimationType.PointToPlane
    attrs, est_code = fused_icp.make_target_attrs(
        est, jnp.asarray(tgt), jnp.asarray(tn))
    plan = rungrid.plan_rungrid(tgt, 0.03, margin=0.25,
                                query_points=src,
                                nch=int(attrs.shape[1]))
    grid = rungrid.make_rungrid(
        jnp.asarray(tgt), attrs, plan["origin"], plan["cell_size"],
        plan["dims"], plan["cap"], est=est_code, kc=plan["kc"])
    shard_spec = NamedSharding(mesh, P(POINTS_AXIS))
    rep = NamedSharding(mesh, P())
    src_j = jax.device_put(jnp.asarray(src), shard_spec)
    mask_j = jax.device_put(jnp.ones(N, bool), shard_spec)
    nrm_j = jax.device_put(jnp.zeros_like(src_j), shard_spec)
    grid = jax.device_put(grid, rep)
    T0 = jax.device_put(jnp.eye(4, dtype=jnp.float32), rep)

    def build(axis_name):
        core = partial(fused_icp.icp_core_rungrid,
                       qcap=plan["qcap"], est_type=est,
                       max_iteration=max_iteration,
                       axis_name=axis_name)
        if axis_name:
            body = core
            out_specs = (P(), P(POINTS_AXIS), P(), P(), P())
        else:
            # per-shard results: stack every output on a fresh
            # leading device axis so the specs line up
            def body(*a):
                return tuple(jnp.expand_dims(x, 0) for x in core(*a))

            out_specs = tuple([P(POINTS_AXIS)] * 5)
        fn = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(POINTS_AXIS), P(POINTS_AXIS), P(POINTS_AXIS),
                      P(), P(), P(), P(), P(), P()),
            out_specs=out_specs,
            check_vma=False))

        def run():
            out = fn(src_j, mask_j, nrm_j, grid, T0,
                     jnp.float32(0.03), plan["rebin_margin"],
                     jnp.float32(1e-6), jnp.float32(1e-6))
            return float(jnp.sum(out[2].reshape(-1)[0:1]))

        return run

    res = {}
    for name, axis in (("with_collectives", POINTS_AXIS),
                       ("without_collectives", None)):
        run = build(axis)
        run()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        res[name + "_s"] = round(best, 4)
    tw = res["with_collectives_s"]
    to = res["without_collectives_s"]
    res.update(
        devices=n_devices,
        points_per_device=points_per_device,
        collective_frac=round(max(0.0, tw - to) / tw, 3),
        host_cores=os.cpu_count(),
        contention_bound=round(min(1.0, (os.cpu_count() or 1)
                                   / n_devices), 3),
    )
    return res


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--points", type=int, default=131072,
                    help="points per device (weak scaling)")
    ap.add_argument("--iters", type=int, default=8,
                    help="ICP iterations per measurement")
    ap.add_argument("--split", action="store_true",
                    help="also report the collective/compute split")
    args = ap.parse_args(argv)
    for r in run_scaling(args.points, max_iteration=args.iters):
        print(json.dumps(r))
    if args.split:
        print(json.dumps(collective_split()))


if __name__ == "__main__":
    main()
