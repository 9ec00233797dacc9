"""FilterReg GMM registration tests
(reference model: filterreg.cu convergence behavior)."""
import numpy as np
import pytest

from cupoch_tpu.geometry import PointCloud
from cupoch_tpu.registration import (
    FilterRegOption,
    registration_filterreg,
)


def make_pair(rng, n=400, angle=0.05, t=(0.02, -0.03, 0.01)):
    tgt = rng.uniform(size=(n, 3)).astype(np.float32)
    R = np.asarray([
        [np.cos(angle), -np.sin(angle), 0],
        [np.sin(angle), np.cos(angle), 0],
        [0, 0, 1],
    ], np.float32)
    # row convention: src = (tgt - t) @ R  <=>  tgt = R @ src + t (cols)
    src = (tgt - np.asarray(t, np.float32)) @ R
    return PointCloud(src), PointCloud(tgt), R, np.asarray(t, np.float32)


def test_recovers_small_motion(rng):
    src, tgt, R_true, t_true = make_pair(rng)
    res = registration_filterreg(src, tgt,
                                 option=FilterRegOption(sigma_initial=0.05))
    T = res.transformation
    np.testing.assert_allclose(T[:3, :3], R_true, atol=0.02)
    np.testing.assert_allclose(T[:3, 3], t_true, atol=0.02)


def test_alignment_error_decreases(rng):
    src, tgt, _, _ = make_pair(rng, angle=0.1, t=(0.05, 0.0, -0.05))
    res = registration_filterreg(src, tgt,
                                 option=FilterRegOption(sigma_initial=0.1))
    moved = PointCloud(np.asarray(src.points))
    moved.transform(res.transformation)
    # nearest-neighbor RMS after registration must beat before
    from cupoch_tpu.knn.bruteforce import knn_search

    def rms(a, b):
        _, d2 = knn_search(np.asarray(a.points), np.asarray(b.points), 1)
        return float(np.sqrt(np.mean(np.asarray(d2)[:, 0])))

    assert rms(moved, tgt) < 0.3 * rms(src, tgt)


def test_identity_stays_identity(rng):
    pts = rng.uniform(size=(200, 3)).astype(np.float32)
    res = registration_filterreg(PointCloud(pts), PointCloud(pts))
    np.testing.assert_allclose(res.transformation, np.eye(4), atol=5e-3)


def test_empty_raises():
    with pytest.raises(RuntimeError):
        registration_filterreg(PointCloud(), PointCloud())
