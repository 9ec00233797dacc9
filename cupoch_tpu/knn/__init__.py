"""Neighbor search (TPU-native replacement for src/cupoch/knn/).

`KDTreeFlann` keeps the reference's class name and query API
(knn/kdtree_flann.h:43-124) but is backed by MXU brute force and the
voxel hash grid instead of a kd-tree.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from . import bruteforce, gridhash, rungrid
from .bruteforce import hybrid_search, knn_search, nn_search
from .gridhash import HashGrid, build_grid, query_hybrid, query_nn, query_radius_count

NUM_MAX_NN = 100  # reference: knn/kdtree_search_param.h:30


class KDTreeSearchParam:
    class SearchType:
        Knn = 0
        Radius = 1
        Hybrid = 2

    def __init__(self, search_type):
        self.search_type = search_type

    def get_search_type(self):
        return self.search_type


class KDTreeSearchParamKNN(KDTreeSearchParam):
    def __init__(self, knn: int = 30):
        super().__init__(KDTreeSearchParam.SearchType.Knn)
        self.knn = int(knn)


class KDTreeSearchParamRadius(KDTreeSearchParam):
    def __init__(self, radius: float, max_nn: int = NUM_MAX_NN):
        super().__init__(KDTreeSearchParam.SearchType.Radius)
        self.radius = float(radius)
        self.max_nn = int(max_nn)


class KDTreeSearchParamHybrid(KDTreeSearchParam):
    def __init__(self, radius: float, max_nn: int):
        super().__init__(KDTreeSearchParam.SearchType.Hybrid)
        self.radius = float(radius)
        self.max_nn = int(max_nn)


# brute force is exact and MXU-friendly; prefer it below this size
_BRUTE_FORCE_LIMIT = 20000


def search_neighbors(
    queries,
    data,
    param: KDTreeSearchParam,
    data_mask=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch on search param; returns ([Q,k] indices, [Q,k] dist2).

    Mirrors KDTreeFlann::Search dispatch (knn/kdtree_flann.inl).
    """
    queries = jnp.asarray(queries, jnp.float32)
    data = jnp.asarray(data, jnp.float32)
    st = param.get_search_type()
    if st == KDTreeSearchParam.SearchType.Knn:
        if data.shape[0] > _BRUTE_FORCE_LIMIT:
            out = rungrid.knn_search_grid(
                np.asarray(queries), np.asarray(data), param.knn,
                data_mask=data_mask,
                queries_dev=queries, data_dev=data)
            if out is not None:
                return out
        return bruteforce.knn_search(queries, data, param.knn, data_mask=data_mask)
    radius, max_nn = param.radius, param.max_nn
    if data.shape[0] <= _BRUTE_FORCE_LIMIT:
        idx, d2, _ = bruteforce.hybrid_search(queries, data, radius, max_nn, data_mask=data_mask)
        return idx, d2
    out = rungrid.knn_search_grid(
        np.asarray(queries), np.asarray(data), max_nn, radius=radius,
        data_mask=data_mask, queries_dev=queries, data_dev=data)
    if out is not None:
        return out
    grid = gridhash.build_grid(data, radius, mask=data_mask)
    idx, d2, _ = gridhash.query_hybrid(grid, queries, radius, max_nn)
    return idx, d2


class KDTreeFlann:
    """API-compatible front for the TPU search backends.

    reference: knn/kdtree_flann.h — SearchKNN / SearchRadius / SearchHybrid.
    """

    def __init__(self, data=None):
        self._data = None
        if data is not None:
            # accept either a raw array or a geometry with .points
            pts = getattr(data, "points", data)
            self.set_raw_data(pts)

    def set_raw_data(self, data):
        self._data = jnp.asarray(data, jnp.float32)
        return True

    def search(self, query, param: KDTreeSearchParam):
        idx, d2 = search_neighbors(jnp.atleast_2d(jnp.asarray(query, jnp.float32)),
                                   self._data, param)
        k = int(np.sum(np.asarray(idx[0]) >= 0))
        return k, np.asarray(idx), np.asarray(d2)

    def search_knn(self, query, knn: int):
        return self.search(query, KDTreeSearchParamKNN(knn))

    def search_radius(self, query, radius: float, max_nn: int = NUM_MAX_NN):
        return self.search(query, KDTreeSearchParamRadius(radius, max_nn))

    def search_hybrid(self, query, radius: float, max_nn: int):
        return self.search(query, KDTreeSearchParamHybrid(radius, max_nn))


__all__ = [
    "KDTreeFlann",
    "KDTreeSearchParam",
    "KDTreeSearchParamKNN",
    "KDTreeSearchParamRadius",
    "KDTreeSearchParamHybrid",
    "NUM_MAX_NN",
    "search_neighbors",
    "knn_search",
    "nn_search",
    "hybrid_search",
    "HashGrid",
    "build_grid",
    "query_nn",
    "query_hybrid",
    "query_radius_count",
    "bruteforce",
    "gridhash",
]
