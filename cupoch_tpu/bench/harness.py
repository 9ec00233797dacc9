"""Per-op timing harness mirroring the reference's benchmark surface
(examples/python/basic/benchmarks.py: transform, estimate_normals,
voxel_down_sample, outlier removal, registration_icp, cluster_dbscan;
benchmarks2.py: compute_rgbd_odometry; benchmarks3.py: mesh sampling).

Timing discipline for TPU-behind-a-tunnel: `block_until_ready` may
return at enqueue time, so every measurement forces a small host
transfer. Each op is run once to compile/warm and then `reps` times,
reporting the minimum.
"""
from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable, Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class BenchResult:
    name: str
    seconds: float
    detail: str = ""

    def to_dict(self):
        return {"name": self.name, "seconds": round(self.seconds, 6),
                "detail": self.detail}


def _sync(out):
    """Force completion by pulling one element to the host."""
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(out)
              if hasattr(l, "dtype")]
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]
    return out


def time_op(name: str, fn: Callable, reps: int = 3,
            detail: str = "") -> BenchResult:
    _sync(fn())  # compile + settle
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return BenchResult(name, best, detail)


def _load_cloud(pcd_path: Optional[str]):
    from ..geometry import PointCloud

    if pcd_path:
        from .. import io

        return io.read_point_cloud(pcd_path)
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(120_000, 3)).astype(np.float32)
    pcd = PointCloud(pts)
    pcd.colors = rng.uniform(size=(120_000, 3)).astype(np.float32)
    return pcd


def run_benchmarks(pcd_path: Optional[str] = None,
                   trace_dir: Optional[str] = None,
                   reps: int = 3) -> List[BenchResult]:
    """The reference benchmark suite on this library's API."""
    import jax

    from .. import registration
    from ..geometry import PointCloud

    results: List[BenchResult] = []
    pcd = _load_cloud(pcd_path)
    n = len(pcd)

    if trace_dir:
        jax.profiler.start_trace(trace_dir)

    T = np.eye(4, dtype=np.float32)
    results.append(time_op(
        "transform", lambda: PointCloud(np.asarray(pcd.points)).transform(T),
        reps, f"{n} pts"))

    def _normals():
        p = PointCloud(pcd.points)
        p.estimate_normals()
        return p.normals

    results.append(time_op("estimate_normals", _normals, reps,
                           f"{n} pts, knn 30"))
    results.append(time_op(
        "voxel_down_sample", lambda: pcd.voxel_down_sample(0.005).points,
        reps, "voxel 0.005"))
    results.append(time_op(
        "remove_radius_outlier",
        lambda: pcd.remove_radius_outliers(10, 0.1)[0].points, reps,
        "nb 10, r 0.1"))
    results.append(time_op(
        "remove_statistical_outlier",
        lambda: pcd.remove_statistical_outliers(20, 2.0)[0].points, reps,
        "nb 20, std 2.0"))

    ang = np.deg2rad(30.0)
    trans_init = np.asarray(
        [[np.cos(ang), -np.sin(ang), 0, 0],
         [np.sin(ang), np.cos(ang), 0, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    tgt = PointCloud(np.asarray(pcd.points))
    tgt.transform(trans_init)
    results.append(time_op(
        "registration_icp",
        lambda: registration.registration_icp(
            pcd, tgt, 0.02, trans_init,
            registration.TransformationEstimationPointToPoint()
        ).transformation,
        reps, "pt2pt, thr 0.02"))

    results.append(time_op(
        "cluster_dbscan", lambda: pcd.cluster_dbscan(0.02, 10), reps,
        "eps 0.02, min 10"))

    # benchmarks2.py: RGB-D odometry on a synthetic frame pair
    from ..camera import PinholeCameraIntrinsic
    from ..geometry import Image, RGBDImage
    from ..odometry import compute_rgbd_odometry

    rng = np.random.default_rng(1)
    H, W = 240, 320
    depth = (1.0 + 0.2 * rng.random((H, W))).astype(np.float32)
    color = rng.random((H, W)).astype(np.float32)
    rgbd = RGBDImage(Image(color[..., None]), Image(depth[..., None]))
    intr = PinholeCameraIntrinsic(W, H, 250.0, 250.0, W / 2, H / 2)
    results.append(time_op(
        "compute_rgbd_odometry",
        lambda: compute_rgbd_odometry(rgbd, rgbd, intr)[1], reps,
        f"{W}x{H} hybrid"))

    # BASELINE config #2: voxel-downsample + FPFH + FGR pipeline
    def _fgr_pipeline():
        from ..registration import (
            FastGlobalRegistrationOption,
            compute_fpfh_feature,
            fast_global_registration,
        )
        from ..knn import KDTreeSearchParamHybrid

        s = pcd.voxel_down_sample(0.02)
        t = tgt.voxel_down_sample(0.02)
        s.estimate_normals(KDTreeSearchParamHybrid(0.06, 30))
        t.estimate_normals(KDTreeSearchParamHybrid(0.06, 30))
        fs = compute_fpfh_feature(s, KDTreeSearchParamHybrid(0.1, 64))
        ft = compute_fpfh_feature(t, KDTreeSearchParamHybrid(0.1, 64))
        res = fast_global_registration(
            s, t, fs, ft, FastGlobalRegistrationOption())
        return res.transformation

    results.append(time_op("fpfh_fgr_pipeline", _fgr_pipeline, reps,
                           "voxel 0.02 + FPFH + FGR (config #2)"))

    # BASELINE config #4: KinectFusion frame processing
    def _kinfu():
        from ..kinfu import KinfuOption, KinfuPipeline

        opt = KinfuOption(num_pyramid_levels=2, tsdf_length=3.0,
                          tsdf_resolution=64)
        pipe = KinfuPipeline(intr, opt)
        for _ in range(3):
            pipe.process_frame(rgbd)
        return pipe.cur_pose

    results.append(time_op("kinfu_process_frame_x3", _kinfu, reps,
                           "2 levels, 64^3 tsdf (config #4)"))

    # benchmarks3.py: mesh sampling
    from ..geometry.trianglemesh_factory import create_sphere

    mesh = create_sphere(resolution=50)
    results.append(time_op(
        "sample_points_uniformly",
        lambda: mesh.sample_points_uniformly(100_000).points, reps,
        "sphere res 50 -> 100k pts"))

    if trace_dir:
        jax.profiler.stop_trace()
    return results


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pcd", default=None,
                    help="point cloud file (default: synthetic 120k)")
    ap.add_argument("--trace", default=None,
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)
    results = run_benchmarks(args.pcd, args.trace, args.reps)
    for r in results:
        print(f"{r.name:32s} {r.seconds * 1000:10.2f} ms   {r.detail}")
    print(json.dumps([r.to_dict() for r in results]))


if __name__ == "__main__":
    main()
