import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from cupoch_tpu.geometry import PointCloud
from cupoch_tpu.knn import KDTreeSearchParamKNN
from cupoch_tpu import registration as reg


def make_pair(rng, n=500, angle=0.1, trans=(0.02, -0.01, 0.03), noise=0.0):
    # random surface-ish cloud
    tgt = rng.uniform(size=(n, 3)).astype(np.float32)
    R = Rotation.from_euler("xyz", [angle, -angle / 2, angle / 3]).as_matrix().astype(np.float32)
    t = np.asarray(trans, np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    src = (tgt - t) @ R  # src = R^T (tgt - t)  => T @ src = tgt
    if noise:
        src = src + rng.normal(size=src.shape).astype(np.float32) * noise
    return src, tgt, T


def test_kabsch_exact(rng):
    src, tgt, T = make_pair(rng, 200)
    est = np.asarray(reg.kabsch_weighted(
        jnp.asarray(src), jnp.asarray(tgt), jnp.ones(200)))
    np.testing.assert_allclose(est, T, atol=1e-4)


def test_kabsch_with_outlier_weights(rng):
    src, tgt, T = make_pair(rng, 100)
    src_bad = np.concatenate([src, rng.uniform(size=(20, 3)).astype(np.float32) * 10])
    tgt_bad = np.concatenate([tgt, rng.uniform(size=(20, 3)).astype(np.float32) * 10])
    w = np.concatenate([np.ones(100), np.zeros(20)]).astype(np.float32)
    est = np.asarray(reg.kabsch_weighted(
        jnp.asarray(src_bad), jnp.asarray(tgt_bad), jnp.asarray(w)))
    np.testing.assert_allclose(est, T, atol=1e-4)


def test_kabsch_degenerate():
    src = jnp.zeros((10, 3), jnp.float32)
    est = np.asarray(reg.kabsch_weighted(src, src, jnp.zeros(10)))
    np.testing.assert_allclose(est, np.eye(4))


def test_icp_point_to_point(rng):
    src, tgt, T = make_pair(rng, 800, angle=0.05)
    res = reg.registration_icp(
        PointCloud(src), PointCloud(tgt), 0.2,
        criteria=reg.ICPConvergenceCriteria(max_iteration=50),
    )
    assert res.fitness > 0.99
    assert res.inlier_rmse < 1e-3
    np.testing.assert_allclose(res.transformation, T, atol=5e-3)


def test_icp_point_to_plane(rng):
    src, tgt, T = make_pair(rng, 800, angle=0.05)
    target = PointCloud(tgt)
    target.estimate_normals(KDTreeSearchParamKNN(15))
    res = reg.registration_icp(
        PointCloud(src), target, 0.2,
        estimation=reg.TransformationEstimationPointToPlane(),
        criteria=reg.ICPConvergenceCriteria(max_iteration=50),
    )
    assert res.fitness > 0.99
    np.testing.assert_allclose(res.transformation, T, atol=1e-2)


def test_icp_symmetric(rng):
    src, tgt, T = make_pair(rng, 800, angle=0.05)
    target = PointCloud(tgt)
    target.estimate_normals(KDTreeSearchParamKNN(15))
    source = PointCloud(src)
    source.estimate_normals(KDTreeSearchParamKNN(15))
    res = reg.registration_icp(
        source, target, 0.2,
        estimation=reg.TransformationEstimationSymmetricMethod(),
        criteria=reg.ICPConvergenceCriteria(max_iteration=50),
    )
    assert res.fitness > 0.99
    np.testing.assert_allclose(res.transformation, T, atol=1e-2)


def test_icp_requires_normals(rng):
    src, tgt, _ = make_pair(rng, 100)
    with pytest.raises(RuntimeError):
        reg.registration_icp(
            PointCloud(src), PointCloud(tgt), 0.1,
            estimation=reg.TransformationEstimationPointToPlane(),
        )


def test_icp_invalid_distance(rng):
    src, tgt, _ = make_pair(rng, 100)
    with pytest.raises(RuntimeError):
        reg.registration_icp(PointCloud(src), PointCloud(tgt), -1.0)


def test_evaluate_registration(rng):
    src, tgt, T = make_pair(rng, 300)
    res = reg.evaluate_registration(PointCloud(src), PointCloud(tgt), 0.05, T)
    assert res.fitness > 0.99
    assert res.inlier_rmse < 1e-3
    # identity should be worse
    res_id = reg.evaluate_registration(PointCloud(src), PointCloud(tgt), 0.05)
    assert res_id.inlier_rmse > res.inlier_rmse or res_id.fitness < res.fitness


def test_icp_with_noise(rng):
    src, tgt, T = make_pair(rng, 1000, angle=0.04, noise=0.002)
    res = reg.registration_icp(
        PointCloud(src), PointCloud(tgt), 0.1,
        criteria=reg.ICPConvergenceCriteria(max_iteration=40),
    )
    # translation recovered within noise scale
    np.testing.assert_allclose(res.transformation[:3, 3], T[:3, 3], atol=0.01)


def test_icp_correspondence_set(rng):
    src, tgt, T = make_pair(rng, 200)
    res = reg.registration_icp(PointCloud(src), PointCloud(tgt), 0.3)
    cs = res.correspondence_set
    assert cs.shape[1] == 2
    assert len(cs) > 190
    assert np.all(cs[:, 0] >= 0) and np.all(cs[:, 1] >= 0)
    assert np.all(cs[:, 0] < 200) and np.all(cs[:, 1] < 200)
