"""Benchmark harness — prints ONE JSON line.

Headline metric (BASELINE.json): point-to-plane ICP registration
frames/s per chip at 1M source points, through the production
fast path (pooled MXU grid build + slot-kernel ICP loop,
registration/fused_icp.py + knn/poolgrid.py). ``vs_baseline``
compares against the reference GTX 1070 throughput target (>=2x is
the goal). The cupoch reference publishes no absolute numbers
(BASELINE.md); we use a conservative reconstruction of its GTX1070
ICP rate on 1M points (~2.5 fps for a full 20-iteration pt2plane ICP
including per-iteration kd-tree queries) as baseline 1.0.

detail.tracking_frames_per_s re-uses one target grid across frames
(the KinFu/SLAM tracking regime — the reference likewise builds its
kd-tree once per model update, registration.cu:121).

detail.suite carries the rest of the BASELINE evidence: fragment.pcd
ICP matching the reference's own benchmark
(examples/python/basic/benchmarks.py:63-83), the FPFH+FGR pipeline
(config #2), RGB-D odometry + sequence ATE with its pass/fail bound
(config #3), and KinFu frame processing (config #4). Each suite entry
runs in its OWN subprocess (``python bench.py --entry NAME``) so a
kernel fault in one entry cannot take down the rest (VERDICT r4 #1:
in round 4 a KinFu fault also wiped the ATE number).
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

TESTDATA = "/root/reference/examples/testdata"
ATE_BOUND_M = 0.05  # accuracy obligation: the bundled 5-frame RGB-D
# sequence must track within 5 cm ATE RMSE of trajectory.log — the
# regime cupoch's own hybrid odometry achieves on this data
# (BASELINE.md: "match cupoch trajectories within its ATE bound")

SUITE_ENTRIES = ["fragment", "fragment1m", "fgr", "rgbd_odometry",
                 "kinfu", "ate", "scaling"]
ENTRY_TIMEOUT_S = 1800
# the scaling entry runs on a virtual 8-device CPU mesh (multi-chip
# TPU hardware is not available here); its compute/collective split
# separates what would ride ICI from host-core contention
_ENTRY_ENV = {
    "scaling": {"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
}


def _sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf).ravel()[:1]


def _setup_jax():
    import jax
    try:  # persistent compile cache: keeps driver reruns fast
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    except Exception:
        pass


def bench_headline():
    import jax
    import jax.numpy as jnp

    from cupoch_tpu.knn import poolgrid
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
    plan = poolgrid.plan_poolgrid(tgt, 0.05, query_points=src,
                                  est=est_code)

    def build():
        return poolgrid.make_poolgrid(
            tgt_j, attrs, plan["origin"], plan["cell_size"],
            plan["dims"], plan["cap"], plan["kc"], est=est_code,
            tile=plan["tile"], mask=mask,
            active_cells=plan.get("active_cells"))

    def loop(grid):
        return fused_icp.icp_core_pool(
            src_j, mask, jnp.zeros((N, 0), jnp.float32), grid, T0,
            jnp.float32(0.05), plan["rebin_margin"],
            jnp.float32(REL_TOL), jnp.float32(REL_TOL),
            plan["qp"], est, ITERS)

    # a frame = grid build over the target + the full fused ICP loop
    def run():
        T, idx, fit, rmse, it, nq = loop(build())
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

    # tracking mode: one target grid serves many frames (KinFu/SLAM)
    grid = build()
    _sync(grid.off)
    tt = []
    for _ in range(3):
        t0 = time.perf_counter()
        T, idx, fit_t, rmse_t, it_t, _nq = loop(grid)
        _ = float(fit_t)
        tt.append(time.perf_counter() - t0)
    track_dt = min(tt)

    build_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        g = build()
        _sync(g.off)
        build_s = min(build_s, time.perf_counter() - t0)

    # roofline accounting for the measured loop (VERDICT r4 #2c):
    # per GN pass the kernel streams the scan table once per supertile
    # grid step plus the qpool + gather traffic of the epilogue
    G = plan and (int(np.prod(plan["dims"])) + plan["tile"] - 1) \
        // plan["tile"]
    scan_bytes = 4 * int(np.prod(plan["dims"])) * plan["kc"] * 2
    iters_run = max(int(it), 1)
    pass_s = track_dt / iters_run
    bw = scan_bytes / pass_s / 1e9

    baseline_fps = 2.5  # reconstructed GTX1070 full-ICP rate @1M pts
    import jax as _jax
    return {
        "metric": "icp_pt2plane_1M_frames_per_s",
        "value": round(1.0 / dt, 4),
        "unit": "frames/s",
        "vs_baseline": round(1.0 / dt / baseline_fps, 3),
        "detail": {
            "max_iters": ITERS,
            "iters_run": int(it),
            "points": N,
            "fitness": float(fit),
            "rmse": float(rmse),
            "secs_per_frame": round(dt, 4),
            "grid_build_s": round(build_s, 4),
            "icp_loop_s": round(dt - build_s, 4),
            "tracking_frames_per_s": round(1.0 / track_dt, 4),
            "pass_ms": round(pass_s * 1e3, 2),
            "scan_stream_gb_per_s": round(bw, 1),
            "kc": plan["kc"],
            "qp": plan["qp"],
            "tile": plan["tile"],
            "device": str(_jax.devices()[0]),
        },
    }


# ---------------------------------------------------------------------------
# suite entries — each runs standalone in its own subprocess
# ---------------------------------------------------------------------------

def entry_fragment():
    """Config #1b: the reference's own benchmark
    (benchmarks.py:63-83 — registration_icp on fragment.pcd against a
    30-degree-rotated copy, pt2pt, thr 0.02)."""
    from cupoch_tpu import io, registration
    from cupoch_tpu.geometry import PointCloud

    pcd = io.read_point_cloud(os.path.join(TESTDATA, "fragment.pcd"))
    a = np.deg2rad(30.0)
    trans_init = np.asarray(
        [[np.cos(a), -np.sin(a), 0, 0], [np.sin(a), np.cos(a), 0, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    tgt = PointCloud(np.asarray(pcd.points))
    tgt.transform(trans_init)

    def run():
        return registration.registration_icp(
            pcd, tgt, 0.02, trans_init,
            registration.TransformationEstimationPointToPoint())

    res = run()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        res = run()
        best = min(best, time.perf_counter() - t0)
    # plan stats: how the pooled grid sized itself on this surface
    # cloud (kc/cap/qp + compaction ratio + capacity drops)
    from cupoch_tpu.knn import poolgrid

    src_t = np.asarray(pcd.points) @ trans_init[:3, :3].T \
        + trans_init[:3, 3]
    plan = poolgrid.plan_poolgrid(np.asarray(tgt.points), 0.02,
                                  query_points=src_t,
                                  est=poolgrid.EST_PT2PT)
    stats = {}
    if plan is not None:
        n_cells = int(np.prod(plan["dims"]))
        stats = {"fragment_plan_kc": plan["kc"],
                 "fragment_plan_cap": plan["cap"],
                 "fragment_plan_qp": plan["qp"],
                 "fragment_plan_cells": n_cells,
                 "fragment_plan_active_frac": round(
                     plan["n_active"] / n_cells, 3)}
    return {"fragment_points": len(pcd),
            "fragment_icp_pt2pt_s": round(best, 4),
            "fragment_fitness": round(res.fitness, 4),
            "fragment_dropped_target": res.n_dropped_target,
            "fragment_dropped_queries": res.n_dropped_queries,
            **stats}


def entry_fragment1m():
    """Fragment-derived 1M-point co-headline with PARTIAL overlap
    (VERDICT r4 #6: the synthetic exact-copy headline flatters; this
    tiles the real scan to ~1M points and registers an 88%-overlap
    noisy source): full pt2plane ICP incl. grid build per frame."""
    import jax.numpy as jnp

    from cupoch_tpu import io
    from cupoch_tpu.knn import poolgrid
    from cupoch_tpu.registration import fused_icp
    from cupoch_tpu.registration.estimation import (
        TransformationEstimationType,
    )

    pcd = io.read_point_cloud(os.path.join(TESTDATA, "fragment.pcd"))
    base = np.asarray(pcd.points)
    rng = np.random.default_rng(0)
    tiles = []
    ext = base.max(0) - base.min(0)
    for i in range(3):
        for j in range(3):
            tiles.append(base + np.float32(
                [i * (ext[0] + 0.1), j * (ext[1] + 0.1), 0.0]))
    tgt = np.concatenate(tiles, 0).astype(np.float32)  # ~1.02M
    # partial overlap: drop the top 12% z-band from the source and
    # perturb with sensor-scale noise + a small rigid motion
    zcut = np.quantile(tgt[:, 2], 0.88)
    src = tgt[tgt[:, 2] <= zcut]
    src = src + rng.normal(0, 0.002, src.shape).astype(np.float32)
    ang = 0.01
    R = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
                   np.float32)
    src = (src @ R.T + np.float32([0.01, -0.008, 0.004])) \
        .astype(np.float32)

    # per-point normals for pt2plane via the library's own estimator
    from cupoch_tpu.geometry import PointCloud
    from cupoch_tpu.knn import KDTreeSearchParamHybrid

    tc = PointCloud(tgt)
    tc.estimate_normals(KDTreeSearchParamHybrid(0.05, 30))
    tn = np.asarray(tc.normals)

    est = TransformationEstimationType.PointToPlane
    attrs, est_code = fused_icp.make_target_attrs(
        est, jnp.asarray(tgt), jnp.asarray(tn))
    # 0.03 m correspondence threshold: at 1M surface points the
    # 0.02 m grid's active-cell score table alone would need ~11 GB
    max_corr = 0.03
    plan = poolgrid.plan_poolgrid(tgt, max_corr, query_points=src,
                                  est=est_code)
    if plan is None:
        return {"fragment1m_frames_per_s": "error: plan rejected"}
    N = src.shape[0]
    src_j = jnp.asarray(src)
    tgt_j = jnp.asarray(tgt)
    mask = jnp.ones(tgt.shape[0], bool)
    smask = jnp.ones(N, bool)
    T0 = jnp.eye(4, dtype=jnp.float32)

    def run():
        grid = poolgrid.make_poolgrid(
            tgt_j, attrs, plan["origin"], plan["cell_size"],
            plan["dims"], plan["cap"], plan["kc"], est=est_code,
            tile=plan["tile"], mask=mask,
            active_cells=plan.get("active_cells"))
        return fused_icp.icp_core_pool(
            src_j, smask, jnp.zeros((N, 0), jnp.float32), grid, T0,
            jnp.float32(max_corr), plan["rebin_margin"],
            jnp.float32(1e-6), jnp.float32(1e-6), plan["qp"], est, 20)

    out = run()
    _ = float(out[2])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = run()
        fit = float(out[2])
        best = min(best, time.perf_counter() - t0)
    n_cells = int(np.prod(plan["dims"]))
    return {"fragment1m_points": int(tgt.shape[0]),
            "fragment1m_src_points": int(N),
            "fragment1m_frames_per_s": round(1.0 / best, 3),
            "fragment1m_fitness": round(fit, 4),
            "fragment1m_rmse": round(float(out[3]), 5),
            "fragment1m_iters": int(out[4]),
            "fragment1m_active_frac": round(
                plan["n_active"] / n_cells, 3)}


def entry_fgr():
    """Config #2: voxel-downsample + normals + FPFH + FGR pipeline."""
    from cupoch_tpu.geometry import PointCloud
    from cupoch_tpu.knn import KDTreeSearchParamHybrid
    from cupoch_tpu.registration import (
        FastGlobalRegistrationOption,
        compute_fpfh_feature,
        fast_global_registration,
    )

    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(120_000, 3)).astype(np.float32)
    a = np.deg2rad(20.0)
    Rz = np.asarray([[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0], [0, 0, 1]],
                    np.float32)

    def run():
        s = PointCloud(pts).voxel_down_sample(0.02)
        t = PointCloud(pts @ Rz.T).voxel_down_sample(0.02)
        s.estimate_normals(KDTreeSearchParamHybrid(0.06, 30))
        t.estimate_normals(KDTreeSearchParamHybrid(0.06, 30))
        fs = compute_fpfh_feature(s, KDTreeSearchParamHybrid(0.1, 64))
        ft = compute_fpfh_feature(t, KDTreeSearchParamHybrid(0.1, 64))
        return fast_global_registration(
            s, t, fs, ft, FastGlobalRegistrationOption()).transformation

    _ = run()          # warm
    t0 = time.perf_counter()
    _ = run()
    return {"fgr_pipeline_s": round(time.perf_counter() - t0, 4)}


def _load_rgbd(k):
    import glob

    from cupoch_tpu import io
    from cupoch_tpu.geometry import RGBDImage

    colors = sorted(glob.glob(os.path.join(TESTDATA, "rgbd/color/*")))
    depths = sorted(glob.glob(os.path.join(TESTDATA, "rgbd/depth/*")))
    return [RGBDImage.create_from_color_and_depth(
        io.read_image(c), io.read_image(d))
        for c, d in zip(colors[:k], depths[:k])]


def entry_rgbd_odometry():
    """Config #3 (speed half): hybrid RGB-D odometry, one frame pair."""
    from cupoch_tpu import io
    from cupoch_tpu.odometry import compute_rgbd_odometry

    intr = io.read_pinhole_camera_intrinsic(
        os.path.join(TESTDATA, "camera_primesense.json"))
    f0, f1 = _load_rgbd(2)

    def run():
        return compute_rgbd_odometry(f1, f0, intr)[1]

    _sync(run())
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _sync(run())
        best = min(best, time.perf_counter() - t0)
    return {"rgbd_odometry_s": round(best, 4)}


def entry_kinfu():
    """Config #4: KinFu TSDF + raycast frame-to-model tracking,
    3 frames (reference loop: kinfu.cpp:51-76)."""
    from cupoch_tpu import io
    from cupoch_tpu.kinfu import KinfuOption, KinfuPipeline

    intr = io.read_pinhole_camera_intrinsic(
        os.path.join(TESTDATA, "camera_primesense.json"))
    frames = _load_rgbd(3)

    def run():
        opt = KinfuOption(num_pyramid_levels=2,
                          tsdf_length=4.0, tsdf_resolution=128)
        pipe = KinfuPipeline(intr, opt)
        for f in frames:
            pipe.process_frame(f)
        return pipe.cur_pose

    _ = run()          # warm/compile
    t0 = time.perf_counter()
    pose = run()
    return {"kinfu_3frames_s": round(time.perf_counter() - t0, 4),
            "kinfu_pose_finite": bool(np.isfinite(pose).all())}


def entry_scaling():
    """BASELINE scaling obligation: weak-scaling efficiency over the
    8-device mesh plus the compute/collective split that attributes
    any loss (collective_frac = what would ride ICI on real chips;
    contention_bound = cores/devices ceiling of the virtual mesh)."""
    from cupoch_tpu.bench.scaling import collective_split, run_scaling

    rows = run_scaling(points_per_device=32768, reps=2,
                       max_iteration=6)
    split = collective_split(points_per_device=16384,
                             max_iteration=6, reps=2)
    eff8 = next((r["efficiency"] for r in rows
                 if r["devices"] == max(x["devices"] for x in rows)),
                None)
    return {"scaling_rows": rows,
            "scaling_eff_max_devices": eff8,
            "scaling_collective_frac": split["collective_frac"],
            "scaling_host_cores": split["host_cores"],
            "scaling_contention_bound": split["contention_bound"]}


def entry_ate():
    """Config #3 (accuracy half): chained odometry ATE RMSE vs the
    bundled trajectory.log, with the BASELINE pass/fail bound."""
    from cupoch_tpu.bench.ate import run_sequence

    t0 = time.perf_counter()
    ate, nframes = run_sequence(TESTDATA)
    return {"odometry_ate_m": round(float(ate), 4),
            "odometry_ate_frames": int(nframes),
            "odometry_ate_bound_m": ATE_BOUND_M,
            "odometry_ate_bound_ok": bool(ate <= ATE_BOUND_M),
            "odometry_ate_total_s": round(time.perf_counter() - t0, 2)}


def run_entry(name):
    _setup_jax()
    fn = globals()[f"entry_{name}"]
    print("BENCH_ENTRY_JSON " + json.dumps(fn()))


def bench_suite():
    """Run each entry in a subprocess; merge their JSON outputs.
    A crash/timeout in one entry records an error string for its
    metrics and the rest still run."""
    suite = {}
    for name in SUITE_ENTRIES:
        try:
            env = dict(os.environ)
            env.update(_ENTRY_ENV.get(name, {}))
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--entry", name],
                capture_output=True, text=True, env=env,
                timeout=ENTRY_TIMEOUT_S)
            payload = None
            for line in proc.stdout.splitlines():
                if line.startswith("BENCH_ENTRY_JSON "):
                    payload = json.loads(
                        line[len("BENCH_ENTRY_JSON "):])
            if payload is None:
                tail = (proc.stderr or proc.stdout or "").strip() \
                    .splitlines()[-3:]
                suite[name] = "error: " + " | ".join(tail)[-300:]
            else:
                suite.update(payload)
        except subprocess.TimeoutExpired:
            suite[name] = f"error: timeout after {ENTRY_TIMEOUT_S}s"
        except Exception as e:  # pragma: no cover - defensive bench
            suite[name] = f"error: {type(e).__name__}: {e}"
    return suite


def main():
    _setup_jax()
    out = bench_headline()
    if os.environ.get("BENCH_HEADLINE_ONLY", "") != "1":
        out["detail"]["suite"] = bench_suite()
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--entry":
        run_entry(sys.argv[2])
    else:
        main()
