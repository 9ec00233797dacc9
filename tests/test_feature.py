"""Feature (FPFH) + FGR tests.

Model: reference tests/registration/feature.cpp and the golden-value
pattern from SURVEY.md section 4 (analytically-known cases instead of
CUDA goldens).
"""
import numpy as np
import pytest

import cupoch_tpu as cph
from cupoch_tpu.knn import KDTreeSearchParamHybrid, KDTreeSearchParamKNN
from cupoch_tpu.registration import (
    FastGlobalRegistrationOption,
    Feature,
    compute_fpfh_feature,
    correspondences_from_features,
    fast_global_registration,
)


def _make_cloud(n=400, seed=3):
    rng = np.random.default_rng(seed)
    # bumpy surface: gives FPFH something to describe
    xy = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
    z = 0.3 * np.sin(3.0 * xy[:, 0]) * np.cos(2.0 * xy[:, 1])
    pts = np.column_stack([xy, z]).astype(np.float32)
    pcd = cph.geometry.PointCloud(pts)
    pcd.estimate_normals(KDTreeSearchParamKNN(12))
    return pcd


def test_feature_container():
    f = Feature(np.zeros((33, 7), np.float32))
    assert f.dimension() == 33
    assert f.num() == 7
    assert not f.is_empty()
    assert Feature().is_empty()


def test_fpfh_requires_normals():
    pcd = cph.geometry.PointCloud(np.random.rand(10, 3).astype(np.float32))
    with pytest.raises(RuntimeError):
        compute_fpfh_feature(pcd)


def test_fpfh_shape_and_histogram_mass():
    pcd = _make_cloud()
    f = compute_fpfh_feature(pcd, KDTreeSearchParamHybrid(0.5, 30))
    data = np.asarray(f.data)
    assert data.shape == (33, len(pcd))
    assert np.all(np.isfinite(data))
    assert np.all(data >= 0.0)
    # SPFH contributes 100 per 11-bin block and the weighted-neighbor
    # part another 100 -> each block sums to ~200 for interior points.
    block = data.reshape(3, 11, -1).sum(axis=1)
    interior = block[:, block.min(axis=0) > 1.0]
    assert interior.size > 0
    np.testing.assert_allclose(interior, 200.0, rtol=0.05)


def test_fpfh_invariant_to_rigid_transform():
    pcd = _make_cloud()
    f1 = np.asarray(compute_fpfh_feature(pcd, KDTreeSearchParamKNN(20)).data)

    ang = 0.7
    R = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0],
                    [0, 0, 1]], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = [0.3, -0.2, 0.5]
    pcd2 = cph.geometry.PointCloud(np.asarray(pcd.points))
    pcd2.normals = np.asarray(pcd.normals)
    pcd2.transform(T)
    f2 = np.asarray(compute_fpfh_feature(pcd2, KDTreeSearchParamKNN(20)).data)
    # histograms are rotation invariant up to float noise in binning
    diff = np.abs(f1 - f2).sum(axis=0) / np.maximum(f1.sum(axis=0), 1.0)
    assert np.median(diff) < 0.15


def test_correspondences_from_features_identity():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(33, 50)).astype(np.float32)
    fs = Feature(feats)
    ft = Feature(feats)
    corres = correspondences_from_features(fs, ft, mutual_filter=True)
    np.testing.assert_array_equal(corres[:, 0], corres[:, 1])
    assert len(corres) == 50


def test_fgr_recovers_transform():
    src = _make_cloud(n=600, seed=5)
    ang = 0.4
    R = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0],
                    [0, 0, 1]], np.float32)
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = R
    T_true[:3, 3] = [0.5, -0.3, 0.2]

    tgt = cph.geometry.PointCloud(np.asarray(src.points))
    tgt.normals = np.asarray(src.normals)
    tgt.transform(T_true)

    fs = compute_fpfh_feature(src, KDTreeSearchParamKNN(25))
    ft = compute_fpfh_feature(tgt, KDTreeSearchParamKNN(25))
    opt = FastGlobalRegistrationOption(maximum_correspondence_distance=0.1)
    res = fast_global_registration(src, tgt, fs, ft, opt)
    assert res.fitness > 0.9
    err = np.abs(res.transformation - T_true).max()
    assert err < 0.05, f"transform error {err}\n{res.transformation}"


def test_fgr_empty_input():
    empty = cph.geometry.PointCloud()
    with pytest.raises(RuntimeError):
        fast_global_registration(empty, empty, Feature(), Feature())
