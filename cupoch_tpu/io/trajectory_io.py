"""Redwood .log camera-trajectory IO
(format used by the bundled testdata rgbd/trajectory.log and
odometry.log: per frame a `i j k` header line then a 4x4 pose).

reference context: cupoch reads these via Open3D conventions in the
RGBD examples; the TPU build makes them first-class IO so ATE
benchmarks can compare against the bundled ground truth.
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..utility import console


def read_trajectory_log(path: str) -> List[np.ndarray]:
    """Returns the list of 4x4 poses (camera-to-world)."""
    poses: List[np.ndarray] = []
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    i = 0
    while i < len(lines):
        header = lines[i].split()
        if len(header) != 3:
            console.log_error(f"[read_trajectory_log] bad header at "
                              f"line {i}: {lines[i]!r}")
        rows = [list(map(float, lines[i + 1 + r].split()))
                for r in range(4)]
        poses.append(np.asarray(rows, np.float32))
        i += 5
    return poses


def write_trajectory_log(path: str, poses) -> bool:
    with open(path, "w") as f:
        for k, T in enumerate(poses):
            T = np.asarray(T, np.float64)
            f.write(f"{k} {k} {k + 1}\n")
            for r in range(4):
                f.write(" ".join(f"{float(v):.17g}" for v in T[r]) + "\n")
    return True
