"""Point-cloud features: FPFH (33-dim) and feature-space correspondences.

reference: src/cupoch/registration/feature.h:39-75, fpfh.cu:34-203.
The reference computes SPFH/FPFH with one CUDA thread per point looping
over a ``[N, max_nn]`` padded neighbor table; here the same neighbor
table feeds fully vectorised ``[N, max_nn]`` pair-feature math, and the
33-bin histograms are built with one-hot matmuls so the accumulation
lands on the MXU instead of scattered atomics. Feature-space nearest
neighbors (`correspondences_from_features`) are a ``[N,33] @ [33,M]``
tiled matmul — exactly the MXU's shape.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..knn import (
    KDTreeSearchParam,
    KDTreeSearchParamKNN,
    search_neighbors,
)
from ..utility import console


class Feature:
    """Dense feature matrix (reference: Feature<Dim>, feature.h:39-55).

    ``data`` is ``[dim, num]`` to match the cupoch/Open3D Python
    convention (one column per point).
    """

    def __init__(self, data=None):
        self.data = (np.zeros((0, 0), np.float32) if data is None
                     else data)

    @property
    def data(self):
        return self._data

    @data.setter
    def data(self, v):
        self._data = jnp.asarray(v, jnp.float32)

    def resize(self, dim: int, n: int):
        self._data = jnp.zeros((dim, n), jnp.float32)

    def dimension(self) -> int:
        return int(self._data.shape[0])

    def num(self) -> int:
        return int(self._data.shape[1])

    def is_empty(self) -> bool:
        return self._data.size == 0

    def __repr__(self):
        return (f"Feature class with dimension = {self.dimension()} and "
                f"num = {self.num()}.")


# ---------------------------------------------------------------------------
# FPFH
# ---------------------------------------------------------------------------

def _pair_features(p1, n1, p2, n2):
    """Darboux-frame pair features (reference: ComputePairFeatures,
    fpfh.cu:34-67). All args [..., 3]; returns (f0, f1, f2, d)."""
    dp = p2 - p1
    d = jnp.linalg.norm(dp, axis=-1)
    safe_d = jnp.maximum(d, 1e-20)
    angle1 = jnp.sum(n1 * dp, -1) / safe_d
    angle2 = jnp.sum(n2 * dp, -1) / safe_d
    # acos(|a1|) > acos(|a2|)  <=>  |a1| < |a2|  (swap source/target roles)
    swap = jnp.abs(angle1) < jnp.abs(angle2)
    sw = swap[..., None]
    n1c = jnp.where(sw, n2, n1)
    n2c = jnp.where(sw, n1, n2)
    dpc = jnp.where(sw, -dp, dp)
    f2 = jnp.where(swap, -angle2, angle1)
    v = jnp.cross(dpc, n1c)
    v_norm = jnp.linalg.norm(v, axis=-1)
    v = v / jnp.maximum(v_norm, 1e-20)[..., None]
    w = jnp.cross(n1c, v)
    f1 = jnp.sum(v * n2c, -1)
    f0 = jnp.arctan2(jnp.sum(w * n2c, -1), jnp.sum(n1c * n2c, -1))
    degenerate = (d == 0.0) | (v_norm == 0.0)
    zero = jnp.zeros_like(f0)
    return (jnp.where(degenerate, zero, f0),
            jnp.where(degenerate, zero, f1),
            jnp.where(degenerate, zero, f2),
            d)


def _hist33(f0, f1, f2, weight):
    """Accumulate three 11-bin histograms -> [N, 33] via one-hot matmul
    (the MXU-friendly replacement for fpfh.cu:92-105's scatter adds)."""
    b0 = jnp.clip(jnp.floor(11.0 * (f0 + jnp.pi) / (2.0 * jnp.pi)), 0, 10)
    b1 = jnp.clip(jnp.floor(11.0 * (f1 + 1.0) * 0.5), 0, 10)
    b2 = jnp.clip(jnp.floor(11.0 * (f2 + 1.0) * 0.5), 0, 10)
    bins = jnp.stack([b0, b1 + 11.0, b2 + 22.0], -1).astype(jnp.int32)
    onehot = jax.nn.one_hot(bins, 33, dtype=jnp.float32)  # [N,K,3,33]
    return jnp.sum(onehot * weight[..., None, None], axis=(1, 2))


@jax.jit
def _spfh(points, normals, idx):
    """[N,33] SPFH from a padded [N,max_nn] neighbor table
    (reference: compute_spfh_functor, fpfh.cu:70-108)."""
    N = points.shape[0]
    self_idx = jnp.arange(N, dtype=jnp.int32)[:, None]
    valid = idx >= 0
    use = valid & (idx != self_idx)
    safe = jnp.clip(idx, 0, N - 1)
    p2 = points[safe]          # [N,K,3]
    n2 = normals[safe]
    f0, f1, f2, _ = _pair_features(
        points[:, None, :], normals[:, None, :], p2, n2)
    cnt = jnp.sum(valid, -1).astype(jnp.float32)
    hist_incr = 100.0 / jnp.maximum(cnt - 1.0, 1.0)
    w = use.astype(jnp.float32) * hist_incr[:, None]
    return _hist33(f0, f1, f2, w)


@jax.jit
def _fpfh(spfh, idx, d2):
    """reference: compute_fpfh_functor (fpfh.cu:141-186). Note the
    reference divides neighbor SPFH by the SQUARED distance."""
    N = spfh.shape[0]
    self_idx = jnp.arange(N, dtype=jnp.int32)[:, None]
    use = (idx >= 0) & (idx != self_idx) & (d2 > 0.0) & jnp.isfinite(d2)
    safe = jnp.clip(idx, 0, N - 1)
    contrib = spfh[safe] / jnp.maximum(d2, 1e-20)[..., None]  # [N,K,33]
    ft = jnp.sum(jnp.where(use[..., None], contrib, 0.0), 1)  # [N,33]
    block_sum = jnp.sum(ft.reshape(N, 3, 11), -1)             # [N,3]
    scale = jnp.where(block_sum != 0.0, 100.0 / block_sum, 0.0)
    ft = ft * jnp.repeat(scale, 11, axis=-1)
    return ft + spfh


def compute_fpfh_feature(
    input,
    search_param: Optional[KDTreeSearchParam] = None,
) -> Feature:
    """33-dim Fast Point Feature Histograms
    (reference: ComputeFPFHFeature, fpfh.cu:190-229)."""
    if not input.has_normals():
        console.log_error(
            "[ComputeFPFHFeature] Failed because input point cloud has no "
            "normal.")
        return Feature()
    search_param = search_param or KDTreeSearchParamKNN()
    pts = input.points
    normals = input.normals
    idx, d2 = search_neighbors(pts, pts, search_param)
    spfh = _spfh(pts, normals, idx)
    ft = _fpfh(spfh, idx, d2)
    f = Feature()
    f.data = ft.T
    return f


# ---------------------------------------------------------------------------
# feature-space correspondences
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("tile",))
def _feature_nn(query_f: jax.Array, data_f: jax.Array, tile: int = 8192):
    """1-NN in feature space; [Q,D] x [N,D] -> [Q] int32. MXU matmul."""
    Q = query_f.shape[0]
    n_tiles = max(1, -(-Q // tile))
    qp = jnp.pad(query_f, ((0, n_tiles * tile - Q), (0, 0)))
    dn = jnp.sum(data_f * data_f, -1)

    def body(q_tile):
        cross = jnp.dot(q_tile, data_f.T,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        d2 = jnp.sum(q_tile * q_tile, -1, keepdims=True) + dn[None] - 2 * cross
        return jnp.argmin(d2, -1).astype(jnp.int32)

    nn = jax.lax.map(body, qp.reshape(n_tiles, tile, -1))
    return nn.reshape(-1)[:Q]


def correspondences_from_features(
    source_features: Feature,
    target_features: Feature,
    mutual_filter: bool = False,
    mutual_consistency_ratio: float = 0.1,
) -> np.ndarray:
    """[K,2] int32 correspondence set (reference:
    CorrespondencesFromFeatures, feature.h:69-72 / feature.cu)."""
    src = source_features.data.T  # [N,D]
    tgt = target_features.data.T  # [M,D]
    n_src = src.shape[0]
    nn_st = _feature_nn(src, tgt)
    corres = np.stack(
        [np.arange(n_src, dtype=np.int32), np.asarray(nn_st)], -1)
    if not mutual_filter:
        return corres
    nn_ts = np.asarray(_feature_nn(tgt, src))
    mutual = nn_ts[corres[:, 1]] == corres[:, 0]
    if mutual.sum() >= mutual_consistency_ratio * n_src:
        return corres[mutual]
    console.log_warning(
        "Too few correspondences after mutual filter, fall back to "
        "original correspondences.")
    return corres
