"""SHOT descriptor tests (reference model: shot.cu behavior —
invariance and discrimination properties rather than goldens)."""
import numpy as np
import pytest

from cupoch_tpu.geometry import PointCloud
from cupoch_tpu.registration import compute_shot_feature


def make_surface(rng, n=500):
    """Wavy surface with distinctive local shape."""
    xy = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
    z = 0.3 * np.sin(3 * xy[:, 0]) * np.cos(2 * xy[:, 1])
    pts = np.column_stack([xy, z]).astype(np.float32)
    pcd = PointCloud(pts)
    pcd.estimate_normals()
    return pcd


def test_shape_and_normalisation(rng):
    pcd = make_surface(rng)
    f = compute_shot_feature(pcd, radius=0.3)
    assert f.dimension() == 352
    assert f.num() == len(pcd)
    data = np.asarray(f.data)
    norms = np.linalg.norm(data, axis=0)
    nonzero = norms > 0
    assert nonzero.mean() > 0.9
    np.testing.assert_allclose(norms[nonzero], 1.0, atol=1e-5)


def test_requires_normals(rng):
    pcd = PointCloud(rng.uniform(size=(50, 3)).astype(np.float32))
    with pytest.raises(RuntimeError):
        compute_shot_feature(pcd, radius=0.3)


def test_rigid_invariance(rng):
    """SHOT is rotation/translation invariant: descriptors of a
    transformed copy must match the originals."""
    pcd = make_surface(rng, n=400)
    f0 = np.asarray(compute_shot_feature(pcd, radius=0.4).data)

    ang = 0.7
    R = np.asarray([
        [np.cos(ang), -np.sin(ang), 0],
        [np.sin(ang), np.cos(ang), 0],
        [0, 0, 1],
    ], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = [0.5, -1.0, 2.0]
    moved = PointCloud(np.asarray(pcd.points))
    moved.normals = np.asarray(pcd.normals)
    moved.transform(T)
    f1 = np.asarray(compute_shot_feature(moved, radius=0.4).data)

    ok = (np.linalg.norm(f0, axis=0) > 0) & (np.linalg.norm(f1, axis=0) > 0)
    # cosine similarity per point
    sim = np.sum(f0[:, ok] * f1[:, ok], 0)
    assert np.median(sim) > 0.95


def test_discriminates_distinct_geometry(rng):
    """Descriptors at geometrically different points differ."""
    pcd = make_surface(rng, n=600)
    f = np.asarray(compute_shot_feature(pcd, radius=0.4).data)
    ok = np.linalg.norm(f, axis=0) > 0
    fo = f[:, ok]
    # cross-similarity of random distinct pairs is clearly below 1
    idx = rng.permutation(fo.shape[1])
    sim = np.sum(fo * fo[:, idx], 0)
    distinct = idx != np.arange(fo.shape[1])
    assert np.median(sim[distinct]) < 0.95
