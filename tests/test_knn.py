import numpy as np
import pytest

import jax.numpy as jnp

from cupoch_tpu import knn
from cupoch_tpu.knn import bruteforce, gridhash


def brute_np(queries, data, k):
    d2 = ((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return idx, np.take_along_axis(d2, idx, 1)


def test_knn_search_exact(rng):
    data = rng.normal(size=(500, 3)).astype(np.float32)
    queries = rng.normal(size=(100, 3)).astype(np.float32)
    idx, d2 = bruteforce.knn_search(jnp.asarray(queries), jnp.asarray(data), 5)
    ridx, rd2 = brute_np(queries, data, 5)
    np.testing.assert_allclose(np.sort(np.asarray(d2)), np.sort(rd2), atol=1e-4)
    # indices may tie-swap; check distances via gathered points
    got = data[np.asarray(idx)]
    want = data[ridx]
    np.testing.assert_allclose(
        np.sort(((queries[:, None] - got) ** 2).sum(-1)),
        np.sort(((queries[:, None] - want) ** 2).sum(-1)),
        atol=1e-4,
    )


def test_knn_with_mask(rng):
    data = rng.normal(size=(100, 3)).astype(np.float32)
    mask = np.zeros(100, bool)
    mask[:50] = True
    q = data[:10]
    idx, d2 = bruteforce.knn_search(jnp.asarray(q), jnp.asarray(data), 3,
                                    data_mask=jnp.asarray(mask))
    assert np.asarray(idx).max() < 50


def test_nn_search(rng):
    data = rng.normal(size=(300, 3)).astype(np.float32)
    q = rng.normal(size=(64, 3)).astype(np.float32)
    idx, d2 = bruteforce.nn_search(jnp.asarray(q), jnp.asarray(data))
    ridx, rd2 = brute_np(q, data, 1)
    np.testing.assert_allclose(np.asarray(d2), rd2[:, 0], atol=1e-4)


def test_hybrid_search_radius_bound(rng):
    data = rng.uniform(size=(400, 3)).astype(np.float32)
    q = data[:50]
    idx, d2, cnt = bruteforce.hybrid_search(jnp.asarray(q), jnp.asarray(data), 0.1, 10)
    d2 = np.asarray(d2)
    assert np.all(d2[np.isfinite(d2)] <= 0.1 ** 2 + 1e-6)
    rd2 = ((q[:, None] - data[None]) ** 2).sum(-1)
    ref_cnt = np.minimum((rd2 <= 0.1 ** 2).sum(1), 10)
    np.testing.assert_array_equal(np.asarray(cnt), ref_cnt)


def test_gridhash_nn_matches_bruteforce(rng):
    data = rng.uniform(size=(2000, 3)).astype(np.float32) * 2.0
    q = rng.uniform(size=(256, 3)).astype(np.float32) * 2.0
    radius = 0.2
    grid = gridhash.build_grid(jnp.asarray(data), radius, bucket_cap=128)
    idx, d2 = gridhash.query_nn(grid, jnp.asarray(q), radius)
    rd2 = ((q[:, None] - data[None]) ** 2).sum(-1)
    ref_min = rd2.min(1)
    got = np.asarray(d2)
    within = ref_min <= radius ** 2
    np.testing.assert_allclose(got[within], ref_min[within], atol=1e-5)
    assert np.all(~np.isfinite(got[~within]))


def test_gridhash_hybrid_matches_bruteforce(rng):
    data = rng.uniform(size=(1000, 3)).astype(np.float32)
    q = data[:128]
    radius = 0.15
    grid = gridhash.build_grid(jnp.asarray(data), radius, bucket_cap=256)
    idx, d2, cnt = gridhash.query_hybrid(grid, jnp.asarray(q), radius, 8)
    rd2 = ((q[:, None] - data[None]) ** 2).sum(-1)
    ref_cnt = np.minimum((rd2 <= radius ** 2).sum(1), 8)
    np.testing.assert_array_equal(np.asarray(cnt), ref_cnt)
    ref_sorted = np.sort(rd2, axis=1)[:, :8]
    got = np.asarray(d2)
    for i in range(128):
        k = ref_cnt[i]
        np.testing.assert_allclose(got[i, :k], ref_sorted[i, :k], atol=1e-5)


def test_gridhash_masked_build(rng):
    data = rng.uniform(size=(200, 3)).astype(np.float32)
    mask = np.zeros(200, bool)
    mask[:100] = True
    grid = gridhash.build_grid(jnp.asarray(data), 0.3, mask=jnp.asarray(mask),
                               bucket_cap=256)
    idx, d2 = gridhash.query_nn(grid, jnp.asarray(data[150:160]), 0.3)
    valid = np.asarray(idx) >= 0
    assert np.all(np.asarray(idx)[valid] < 100)


def test_kdtreeflann_api(rng):
    data = rng.normal(size=(128, 3)).astype(np.float32)
    tree = knn.KDTreeFlann(data)
    k, idx, d2 = tree.search_knn(data[3], 4)
    assert k == 4
    assert idx[0, 0] == 3  # self is nearest
    k, idx, d2 = tree.search_hybrid(data[3], 0.5, 4)
    assert k >= 1


def test_radius_count(rng):
    data = rng.uniform(size=(500, 3)).astype(np.float32)
    grid = gridhash.build_grid(jnp.asarray(data), 0.2, bucket_cap=256)
    cnt = gridhash.query_radius_count(grid, jnp.asarray(data[:64]), 0.2)
    rd2 = ((data[:64, None] - data[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(cnt), (rd2 <= 0.2 ** 2).sum(1))
