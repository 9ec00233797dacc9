"""Tiled brute-force nearest-neighbor search on the MXU.

TPU-native replacement for the reference's kd-tree / brute-force search
(src/cupoch/knn/kdtree_flann.h:43-124, knn/bruteforce_nn.h): pairwise
distances are computed as ``|x|^2 + |y|^2 - 2 x @ y^T`` so the O(Q*N*D)
work lands on the 128x128 systolic array, tiled over queries with
`lax.map` to bound the [tile, N] distance matrix in memory.

Outputs follow the reference contract exactly: dense ``[Q, k]`` index /
distance^2 arrays padded with -1 / +inf (knn/kdtree_flann.inl fills
unused slots the same way).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utility.shape import INVALID_INDEX

_DEFAULT_TILE = 1024


def _pad_queries(q: jax.Array, tile: int):
    Q = q.shape[0]
    n_tiles = max(1, -(-Q // tile))
    qp = jnp.pad(q, ((0, n_tiles * tile - Q),) + ((0, 0),) * (q.ndim - 1))
    return qp.reshape(n_tiles, tile, *q.shape[1:]), Q


def _pairwise_dist2(q_tile: jax.Array, data: jax.Array) -> jax.Array:
    """[T,D] x [N,D] -> [T,N] squared distances via MXU matmul.

    Precision.HIGHEST is required: the TPU MXU's default bf16 passes
    give ~1e-2 absolute error on the cross term, far too coarse for
    fine registration thresholds (e.g. 0.005 voxel sizes).
    """
    qn = jnp.sum(q_tile * q_tile, -1, keepdims=True)
    dn = jnp.sum(data * data, -1)
    cross = jnp.dot(q_tile, data.T, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    d2 = qn + dn[None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


@partial(jax.jit, static_argnames=("k", "tile"))
def knn_search(
    queries: jax.Array,
    data: jax.Array,
    k: int,
    data_mask: Optional[jax.Array] = None,
    tile: int = _DEFAULT_TILE,
) -> Tuple[jax.Array, jax.Array]:
    """k-NN: returns (indices [Q,k] int32, dist2 [Q,k] f32)."""
    N = data.shape[0]
    k_eff = min(k, N)
    tiles, Q = _pad_queries(queries, tile)
    inf = jnp.float32(jnp.inf)

    def body(q_tile):
        d2 = _pairwise_dist2(q_tile, data)
        if data_mask is not None:
            d2 = jnp.where(data_mask[None, :], d2, inf)
        neg, idx = jax.lax.top_k(-d2, k_eff)
        return idx.astype(jnp.int32), -neg

    idxs, d2s = jax.lax.map(body, tiles)
    idxs = idxs.reshape(-1, k_eff)[:Q]
    d2s = d2s.reshape(-1, k_eff)[:Q]
    if k_eff < k:
        padi = jnp.full((Q, k - k_eff), INVALID_INDEX, jnp.int32)
        padd = jnp.full((Q, k - k_eff), inf, jnp.float32)
        idxs = jnp.concatenate([idxs, padi], -1)
        d2s = jnp.concatenate([d2s, padd], -1)
    invalid = ~jnp.isfinite(d2s)
    idxs = jnp.where(invalid, INVALID_INDEX, idxs)
    return idxs, d2s


@partial(jax.jit, static_argnames=("max_nn", "tile"))
def hybrid_search(
    queries: jax.Array,
    data: jax.Array,
    radius: jax.Array | float,
    max_nn: int,
    data_mask: Optional[jax.Array] = None,
    tile: int = _DEFAULT_TILE,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Radius-bounded k-NN (reference SearchHybrid semantics).

    Returns (indices [Q,max_nn], dist2 [Q,max_nn], counts [Q]); slots
    beyond the radius are -1 / inf.
    """
    idxs, d2s = knn_search(queries, data, max_nn, data_mask=data_mask, tile=tile)
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    within = d2s <= r2
    idxs = jnp.where(within, idxs, INVALID_INDEX)
    d2s = jnp.where(within, d2s, jnp.inf)
    counts = jnp.sum(within, -1).astype(jnp.int32)
    return idxs, d2s, counts


@partial(jax.jit, static_argnames=("tile",))
def nn_search(
    queries: jax.Array,
    data: jax.Array,
    data_mask: Optional[jax.Array] = None,
    tile: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """1-NN: returns (index [Q], dist2 [Q]).

    Selection runs as ONE bf16 MXU pass per tile over a split-
    precision augmented table (the knn/poolgrid.py trick, taken to a
    THREE-way 8+8+8-bit mantissa split): score s = |p|^2 - 2 q.p is
    f32-faithful via all split products down to the 2^-24 level
    packed into a single K=21 contraction — |q|^2 is argmin-invariant
    and skipped. The winner's distance is then recomputed exactly in
    f32, so the returned d2 is exact; the index can differ from the
    true NN only on ties at ~2^-24 relative score noise. The previous
    Precision.HIGHEST path (6 MXU passes + two broadcast adds over
    the [T, N] matrix) measured 0.59 s per 268k x 32k pass on a v5e;
    this layout is bound by the single [T, N] score stream."""
    tiles, Q = _pad_queries(queries, tile)
    N = data.shape[0]
    big = jnp.float32(1e30)

    def split3(x):
        h = x.astype(jnp.bfloat16)
        r = x - h.astype(jnp.float32)
        m = r.astype(jnp.bfloat16)
        low = (r - m.astype(jnp.float32)).astype(jnp.bfloat16)
        return h, m, low

    ph, pm, pl = split3(data)
    pn = jnp.sum(data * data, -1)
    if data_mask is not None:
        pn = jnp.where(data_mask, pn, big)
    pnh, pnm, pnl = split3(pn)
    B = jnp.concatenate([
        -2.0 * ph.T, -2.0 * pm.T, -2.0 * pl.T,   # vs qh
        -2.0 * ph.T, -2.0 * pm.T,                # vs qm
        -2.0 * ph.T,                             # vs ql
        pnh[None, :], pnm[None, :], pnl[None, :]], 0)  # [21, N]

    def body(q_tile):
        qh, qm, ql = split3(q_tile)
        one = jnp.ones((q_tile.shape[0], 1), jnp.bfloat16)
        A = jnp.concatenate([qh, qh, qh, qm, qm, ql,
                             one, one, one], 1)  # [T, 21]
        s = jax.lax.dot_general(
            A, B, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [T, N]
        i = jnp.argmin(s, -1).astype(jnp.int32)
        p = data[i]
        d = q_tile - p
        d2 = jnp.sum(d * d, -1)
        if data_mask is not None:
            d2 = jnp.where(data_mask[i], d2, jnp.inf)
        return i, d2

    idxs, d2s = jax.lax.map(body, tiles)
    return idxs.reshape(-1)[:Q], d2s.reshape(-1)[:Q]
