"""Colored ICP / Generalized ICP / Symmetric ICP recovery tests.

Model: reference behavior of RegistrationColoredICP (colored_icp.cu) and
RegistrationGeneralizedICP (generalized_icp.cu) — each variant must
recover a small rigid motion of a structured cloud.
"""
import numpy as np
import pytest

import cupoch_tpu as cph
from cupoch_tpu.knn import KDTreeSearchParamKNN
from cupoch_tpu.registration import (
    ICPConvergenceCriteria,
    TransformationEstimationForGeneralizedICP,
    TransformationEstimationSymmetricMethod,
    covariances_from_normals,
    registration_colored_icp,
    registration_generalized_icp,
    registration_icp,
)


def _surface_cloud(n=800, seed=7, colored=False):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
    z = 0.25 * np.sin(2.5 * xy[:, 0]) * np.cos(1.5 * xy[:, 1])
    pts = np.column_stack([xy, z]).astype(np.float32)
    pcd = cph.geometry.PointCloud(pts)
    pcd.estimate_normals(KDTreeSearchParamKNN(15))
    if colored:
        # smooth color field so the photometric term has gradients
        c = 0.5 + 0.4 * np.sin(4.0 * pts[:, :1]) * np.cos(3.0 * pts[:, 1:2])
        pcd.colors = np.repeat(c, 3, axis=1).astype(np.float32)
    return pcd


def _small_motion():
    ang = 0.03
    R = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0],
                    [0, 0, 1]], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = [0.01, -0.015, 0.02]
    return T


def _transformed_copy(pcd, T):
    out = cph.geometry.PointCloud(np.asarray(pcd.points))
    if pcd.has_normals():
        out.normals = np.asarray(pcd.normals)
    if pcd.has_colors():
        out.colors = np.asarray(pcd.colors)
    out.transform(T)
    return out


def test_covariances_from_normals():
    n = np.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], np.float32)
    C = np.asarray(covariances_from_normals(n, 1e-3))
    # covariance along the normal must be epsilon, tangent 1
    for i in range(2):
        ni = n[i]
        np.testing.assert_allclose(ni @ C[i] @ ni, 1e-3, atol=1e-5)
        w, _ = np.linalg.eigh(C[i])
        np.testing.assert_allclose(sorted(w), [1e-3, 1.0, 1.0], atol=1e-4)


@pytest.mark.parametrize("variant", ["gicp", "colored", "symmetric"])
def test_variant_recovers_motion(variant):
    src = _surface_cloud(colored=(variant == "colored"))
    T_true = _small_motion()
    tgt = _transformed_copy(src, T_true)
    crit = ICPConvergenceCriteria(max_iteration=30)
    if variant == "gicp":
        res = registration_generalized_icp(src, tgt, 0.2, criteria=crit)
    elif variant == "colored":
        res = registration_colored_icp(src, tgt, 0.2, criteria=crit)
    else:
        res = registration_icp(
            src, tgt, 0.2,
            estimation=TransformationEstimationSymmetricMethod(),
            criteria=crit)
    err = np.abs(res.transformation - T_true).max()
    assert res.fitness > 0.99
    assert err < 5e-3, f"{variant}: err={err}\n{res.transformation}"


def test_gicp_epsilon_option():
    est = TransformationEstimationForGeneralizedICP(epsilon=1e-2)
    assert est.epsilon == pytest.approx(1e-2)


def test_colored_icp_requires_colors():
    src = _surface_cloud(colored=False)
    tgt = _transformed_copy(src, _small_motion())
    with pytest.raises(RuntimeError):
        registration_colored_icp(src, tgt, 0.2)
