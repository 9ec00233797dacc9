"""Static-shape discipline helpers.

TPU/XLA requires static shapes under `jit`. The reference library
(cupoch) freely resizes `device_vector`s; here every variable-sized
result is carried as a fixed-capacity array plus a validity mask /
count, and user-facing eager wrappers compact to exact size on host.

To bound recompilation when users feed many different cloud sizes, all
eager entry points pad inputs up to a *bucket* size (next power of two,
with a small floor), so at most O(log N) distinct compiled programs
exist per op.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

#: Sentinel index used for invalid / padded entries of index arrays,
#: mirroring cupoch's use of -1 fill in KNN outputs
#: (reference: knn/kdtree_flann.inl search results padding).
INVALID_INDEX = -1

_MIN_BUCKET = 8


def bucket_size(n: int, min_size: int = _MIN_BUCKET) -> int:
    """Round ``n`` up to the next power of two (>= min_size)."""
    if n <= min_size:
        return min_size
    return 1 << math.ceil(math.log2(n))


def pad_axis0(x: jax.Array, capacity: int, fill=0) -> jax.Array:
    """Pad ``x`` with ``fill`` along axis 0 up to ``capacity`` rows."""
    n = x.shape[0]
    if n == capacity:
        return x
    if n > capacity:
        raise ValueError(f"cannot pad {n} rows into capacity {capacity}")
    pad_width = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad_width, constant_values=fill)


def valid_mask(count, capacity: int) -> jax.Array:
    """Boolean mask of shape [capacity] true for the first ``count`` rows."""
    return jnp.arange(capacity) < count


def compact_by_mask(x: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Host-side compaction: keep rows where mask is true (NumPy)."""
    return np.asarray(x)[np.asarray(mask)]


def masked_min(x: jax.Array, mask: jax.Array, axis=None, big=jnp.inf):
    return jnp.min(jnp.where(mask, x, big), axis=axis)


def masked_max(x: jax.Array, mask: jax.Array, axis=None, small=-jnp.inf):
    return jnp.max(jnp.where(mask, x, small), axis=axis)


def masked_sum(x: jax.Array, mask: jax.Array, axis=None):
    return jnp.sum(jnp.where(mask, x, 0), axis=axis)


def masked_mean(x: jax.Array, mask: jax.Array, axis=None):
    s = masked_sum(x, mask, axis=axis)
    c = jnp.sum(mask, axis=axis)
    return s / jnp.maximum(c, 1)


def moveaxis_mask(mask: jax.Array, x: jax.Array) -> jax.Array:
    """Broadcast a [N] mask against x of shape [N, ...]."""
    extra = x.ndim - mask.ndim
    return mask.reshape(mask.shape + (1,) * extra)
