"""Tests for the bench harness, ATE pipeline, and trajectory IO."""
import os

import numpy as np
import pytest

from cupoch_tpu.bench.ate import align_first, compute_ate
from cupoch_tpu.io.trajectory_io import (
    read_trajectory_log,
    write_trajectory_log,
)

TESTDATA = "/root/reference/examples/testdata"
needs_testdata = pytest.mark.skipif(
    not os.path.isdir(TESTDATA), reason="reference testdata not mounted")


def test_trajectory_log_roundtrip(tmp_path, rng):
    poses = []
    for i in range(4):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = rng.normal(size=3)
        poses.append(T)
    path = str(tmp_path / "t.log")
    assert write_trajectory_log(path, poses)
    back = read_trajectory_log(path)
    assert len(back) == 4
    for a, b in zip(poses, back):
        np.testing.assert_allclose(a, b, atol=1e-6)


@needs_testdata
def test_read_bundled_trajectory():
    poses = read_trajectory_log(f"{TESTDATA}/rgbd/trajectory.log")
    assert len(poses) == 5
    for T in poses:
        assert T.shape == (4, 4)
        np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-6)
        # rotation block orthonormal
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_ate_zero_for_identical():
    poses = [np.eye(4, dtype=np.float32) for _ in range(3)]
    assert compute_ate(poses, poses) == 0.0


def test_ate_alignment_invariance(rng):
    """ATE is invariant to a common rigid prefix (gauge)."""
    traj = []
    T = np.eye(4, dtype=np.float32)
    for _ in range(5):
        d = np.eye(4, dtype=np.float32)
        d[:3, 3] = rng.normal(scale=0.1, size=3)
        T = T @ d
        traj.append(T.copy())
    offset = np.eye(4, dtype=np.float32)
    offset[:3, 3] = [5, 6, 7]
    moved = [offset @ T for T in traj]
    assert compute_ate(moved, traj) < 1e-5


@needs_testdata
def test_odometry_ate_within_bound():
    """BASELINE accuracy: ATE on the bundled sequence stays small
    (cupoch-parity odometry should track these 5 frames to mm)."""
    from cupoch_tpu.bench.ate import run_sequence

    ate, n = run_sequence(TESTDATA)
    assert n == 5
    assert ate < 0.01, f"ATE {ate} m exceeds 1 cm bound"


def test_scaling_harness_runs():
    from cupoch_tpu.bench.scaling import run_scaling

    rows = run_scaling(points_per_device=2048, reps=1)
    assert rows[0]["devices"] == 1
    assert rows[-1]["devices"] == 8  # conftest forces 8 CPU devices
    assert all(r["points_per_s"] > 0 for r in rows)


def test_time_op_returns_min():
    from cupoch_tpu.bench import time_op

    import jax.numpy as jnp

    r = time_op("x", lambda: jnp.ones(8).sum(), reps=2)
    assert r.seconds > 0 and r.name == "x"
