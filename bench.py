"""Benchmark harness — prints ONE JSON line.

Headline metric (BASELINE.json): point-to-plane ICP registration
frames/s per chip at 1M source points. ``vs_baseline`` compares against
the reference GTX 1070 throughput target (>=2x is the goal). The
cupoch reference publishes no absolute numbers (BASELINE.md); we use a
conservative reconstruction of its GTX1070 ICP rate on 1M points
(~2.5 fps for a full 30-iteration pt2plane ICP including per-iteration
kd-tree queries) as baseline 1.0.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cupoch_tpu.knn import rollgrid
    from cupoch_tpu.registration.registration import _icp_core
    from cupoch_tpu.registration.estimation import TransformationEstimationType

    N = 1_000_000
    M = 1_000_000
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
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    src = (tgt - np.float32([0.01, -0.02, 0.005])) @ R

    src_j = jnp.asarray(src)
    tgt_j = jnp.asarray(tgt)
    tn_j = jnp.asarray(tgt_normals)
    mask_s = jnp.ones(N, bool)
    mask_t = jnp.ones(M, bool)
    T0 = jnp.eye(4, dtype=jnp.float32)

    # dense roll-grid correspondence (Pallas-fused on TPU); a frame =
    # grid build + the full fused ICP loop
    plan = rollgrid.plan_rollgrid(tgt, 0.05)

    def run():
        grid = rollgrid.build_rollgrid(
            tgt_j, jnp.asarray(plan["origin"]), plan["cell_size"],
            plan["dims"], plan["cap"], mask=mask_t)
        T, idx, fit, rmse, it = _icp_core(
            src_j, mask_s, jnp.zeros_like(src_j), tgt_j, mask_t, tn_j, T0,
            jnp.float32(0.05), jnp.float32(REL_TOL), jnp.float32(REL_TOL),
            TransformationEstimationType.PointToPlane, ITERS, "roll",
            roll_grid=grid,
        )
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
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
