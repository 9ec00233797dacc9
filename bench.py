"""Benchmark harness — prints ONE JSON line.

Headline metric (BASELINE.json): point-to-plane ICP registration
frames/s per chip at 1M source points, through the production
`registration_icp` fast path (run-grid build + fully-fused Pallas ICP
loop, registration/fused_icp.py). ``vs_baseline`` compares against the
reference GTX 1070 throughput target (>=2x is the goal). The cupoch
reference publishes no absolute numbers (BASELINE.md); we use a
conservative reconstruction of its GTX1070 ICP rate on 1M points
(~2.5 fps for a full 20-iteration pt2plane ICP including per-iteration
kd-tree queries) as baseline 1.0.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cupoch_tpu.knn import rungrid
    from cupoch_tpu.registration import fused_icp
    from cupoch_tpu.registration.estimation import (
        TransformationEstimationType,
    )

    N = M = 1_000_000
    ITERS = 20        # max ICP iterations per frame
    REL_TOL = 1e-6    # ICPConvergenceCriteria defaults, matching the
    # reference's benchmarks.py which runs registration_icp with
    # default convergence (registration.h:35)

    # volumetric cloud with per-point unit normals: the point-to-plane
    # objective constrains all 6 DoF, so convergence takes a realistic
    # number of GN iterations (a single-normal scene converges its one
    # observable DoF in 1 step and would flatter the fps)
    rng = np.random.default_rng(0)
    tgt = rng.uniform(size=(M, 3)).astype(np.float32) * 2.0
    tgt_normals = rng.normal(size=(M, 3)).astype(np.float32)
    tgt_normals /= np.linalg.norm(tgt_normals, axis=1, keepdims=True)
    ang = 0.02
    R = np.asarray(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]], np.float32)
    src = (tgt - np.float32([0.01, -0.02, 0.005])) @ R

    src_j = jnp.asarray(src)
    tgt_j = jnp.asarray(tgt)
    tn_j = jnp.asarray(tgt_normals)
    mask = jnp.ones(N, bool)
    T0 = jnp.eye(4, dtype=jnp.float32)
    est = TransformationEstimationType.PointToPlane
    attrs, est_code = fused_icp.make_target_attrs(est, tgt_j, tn_j)
    # margin 0.375 measured best on this scene (fewer re-bins beat
    # the larger candidate window once tail gating prunes it)
    plan = rungrid.plan_rungrid(tgt, 0.05, margin=0.375,
                                query_points=src,
                                nch=int(attrs.shape[1]))

    # a frame = run-grid build over the target + the full fused ICP
    # loop (correspondence + in-kernel GN reduction per iteration)
    def run():
        grid = rungrid.make_rungrid(
            tgt_j, attrs, plan["origin"], plan["cell_size"],
            plan["dims"], plan["cap"], mask=mask, est=est_code,
            kc=plan["kc"])
        T, idx, fit, rmse, it = fused_icp.icp_core_rungrid(
            src_j, mask, jnp.zeros_like(src_j), grid, T0,
            jnp.float32(0.05), plan["rebin_margin"],
            jnp.float32(REL_TOL), jnp.float32(REL_TOL),
            plan["qcap"], est, ITERS)
        return T, fit, rmse, it

    # warm-up / compile. NOTE: block_until_ready does not wait for
    # execution through the axon tunnel; a host transfer does.
    T, fit, rmse, it = run()
    _ = float(fit)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        T, fit, rmse, it = run()
        _ = float(fit)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    frames_per_s = 1.0 / dt

    # phase breakdown for the report: grid build alone vs full frame
    # (min of 2 — single-shot timings through the device tunnel are
    # noisy)
    build_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        g = rungrid.make_rungrid(
            tgt_j, attrs, plan["origin"], plan["cell_size"],
            plan["dims"], plan["cap"], mask=mask, est=est_code,
            kc=plan["kc"])
        _ = float(jnp.sum(g.bounds[:1]))
        build_s = min(build_s, time.perf_counter() - t0)

    baseline_fps = 2.5  # reconstructed GTX1070 full-ICP rate @1M pts
    print(json.dumps({
        "metric": "icp_pt2plane_1M_frames_per_s",
        "value": round(frames_per_s, 4),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_s / baseline_fps, 3),
        "detail": {
            "max_iters": ITERS,
            "iters_run": int(it),
            "points": N,
            "fitness": float(fit),
            "rmse": float(rmse),
            "secs_per_frame": round(dt, 4),
            "grid_build_s": round(build_s, 4),
            "icp_loop_s": round(dt - build_s, 4),
            "kc": plan["kc"],
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
