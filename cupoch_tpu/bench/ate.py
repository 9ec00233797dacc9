"""Absolute trajectory error benchmark on the bundled RGB-D sequence
(BASELINE.md accuracy obligation: match cupoch registration/odometry
trajectories within its ATE bound on the bundled example sequences).

Runs hybrid RGB-D odometry (odometry.cu parity path) over consecutive
frames, chains the motions, and reports ATE RMSE against the bundled
ground truth `trajectory.log`. Run:
``python -m cupoch_tpu.bench.ate [--testdata DIR]``.
"""
from __future__ import annotations

import glob
import json
import os
from typing import List, Tuple

import numpy as np


def align_first(est: List[np.ndarray], gt: List[np.ndarray]):
    """Gauge-align: move both trajectories to start at identity."""
    e0 = np.linalg.inv(est[0])
    g0 = np.linalg.inv(gt[0])
    return [e0 @ T for T in est], [g0 @ T for T in gt]


def compute_ate(est: List[np.ndarray], gt: List[np.ndarray]) -> float:
    """ATE RMSE over translations after first-pose alignment."""
    n = min(len(est), len(gt))
    est, gt = align_first(est[:n], gt[:n])
    t_e = np.stack([T[:3, 3] for T in est])
    t_g = np.stack([T[:3, 3] for T in gt])
    return float(np.sqrt(np.mean(np.sum((t_e - t_g) ** 2, -1))))


def run_sequence(testdata: str) -> Tuple[float, int]:
    from .. import io
    from ..geometry import RGBDImage
    from ..io.trajectory_io import read_trajectory_log
    from ..odometry import (
        OdometryOption,
        RGBDOdometryJacobianFromHybridTerm,
        compute_rgbd_odometry,
    )

    intr = io.read_pinhole_camera_intrinsic(
        os.path.join(testdata, "camera_primesense.json"))
    colors = sorted(glob.glob(os.path.join(testdata, "rgbd/color/*")))
    depths = sorted(glob.glob(os.path.join(testdata, "rgbd/depth/*")))
    gt = read_trajectory_log(os.path.join(testdata, "rgbd/trajectory.log"))

    frames = [
        RGBDImage.create_from_color_and_depth(
            io.read_image(c), io.read_image(d))
        for c, d in zip(colors, depths)
    ]
    poses = [np.eye(4, dtype=np.float32)]
    opt = OdometryOption()
    for k in range(1, len(frames)):
        ok, motion, _ = compute_rgbd_odometry(
            frames[k], frames[k - 1], intr,
            jacobian=RGBDOdometryJacobianFromHybridTerm(), option=opt)
        if not ok:
            motion = np.eye(4, dtype=np.float32)
        poses.append((poses[-1] @ motion).astype(np.float32))
    return compute_ate(poses, gt), len(frames)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--testdata",
                    default="/root/reference/examples/testdata")
    args = ap.parse_args(argv)
    ate, n = run_sequence(args.testdata)
    print(json.dumps({
        "metric": "rgbd_odometry_ate_rmse",
        "value": round(ate, 5),
        "unit": "m",
        "frames": n,
    }))


if __name__ == "__main__":
    main()
