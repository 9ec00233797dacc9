"""Kabsch rigid alignment (reference: src/cupoch/registration/kabsch.h:30-50,
kabsch.cu).

The reference overlaps two reduction streams; here the centroid and
cross-covariance reductions are one fused masked pass that XLA
schedules, followed by a 3x3 SVD on device. Unlike the reference
(which divides the correspondence sums by the full cloud size,
kabsch.cu:78), we normalize by the correspondence count, which is the
mathematically-correct Kabsch estimator (matches Open3D).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utility.transforms import make_transform


def kabsch_weighted(
    src: jax.Array,
    dst: jax.Array,
    weights: jax.Array,
) -> jax.Array:
    """Best-fit rigid transform T with T @ src ~= dst.

    src, dst: [N, 3]; weights: [N] (0 for invalid pairs).
    Returns [4,4]. Falls back to identity when degenerate.
    """
    w = weights.astype(src.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    src_c = jnp.sum(src * w[:, None], 0) / wsum
    dst_c = jnp.sum(dst * w[:, None], 0) / wsum
    sc = (src - src_c) * w[:, None]
    dc = dst - dst_c
    H = jnp.dot(sc.T, dc, precision=jax.lax.Precision.HIGHEST) / wsum  # [3,3]
    U, S, Vt = jnp.linalg.svd(H)
    V = Vt.T
    hi = jax.lax.Precision.HIGHEST
    det = jnp.linalg.det(jnp.matmul(V, U.T, precision=hi))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], src.dtype)).at[2, 2].set(det)
    R = jnp.matmul(jnp.matmul(V, D, precision=hi), U.T, precision=hi)
    t = dst_c - jnp.matmul(R, src_c, precision=hi)
    T = make_transform(R, t)
    ok = (jnp.sum(w > 0) >= 3) & jnp.all(jnp.isfinite(T))
    return jnp.where(ok, T, jnp.eye(4, dtype=src.dtype))


def kabsch(
    model: jax.Array,
    target: jax.Array,
    corres: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference-style entry: corres is [K,2] (model_idx, target_idx)
    with -1 rows invalid; None means identity correspondence."""
    if corres is None:
        w = jnp.ones(model.shape[0], model.dtype)
        return kabsch_weighted(model, target, w)
    mi = jnp.clip(corres[:, 0], 0, model.shape[0] - 1)
    ti = jnp.clip(corres[:, 1], 0, target.shape[0] - 1)
    w = (corres[:, 0] >= 0).astype(model.dtype)
    return kabsch_weighted(model[mi], target[ti], w)
