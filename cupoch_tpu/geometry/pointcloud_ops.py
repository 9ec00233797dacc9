"""Functional, jit-safe point-cloud kernels.

TPU-native re-designs of the per-point-cloud algorithms in
src/cupoch/geometry/{down_sample.cu, estimate_normals.cu,
pointcloud_cluster.cu, segmentation.cu}. Thrust
sort_by_key/reduce_by_key pipelines become lexsort + segment_sum;
BFS frontiers become fixed-point label propagation under
`lax.while_loop`; sequential RANSAC becomes a fully batched
hypothesis sweep that lands on the MXU.

All kernels take fixed-capacity arrays plus validity masks and return
the same; eager container methods compact on host.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..knn import bruteforce, gridhash
from ..utility import eigen as ueigen
from ..utility.shape import INVALID_INDEX, masked_max, masked_mean, masked_min


# ---------------------------------------------------------------------------
# voxel down-sample (reference: down_sample.cu:170-218)
# ---------------------------------------------------------------------------

def _segment_mean(values: jax.Array, seg_id: jax.Array, weights: jax.Array,
                  num_segments: int):
    w = weights.astype(values.dtype)
    sums = jax.ops.segment_sum(values * w[:, None], seg_id, num_segments=num_segments)
    cnts = jax.ops.segment_sum(w, seg_id, num_segments=num_segments)
    return sums / jnp.maximum(cnts, 1.0)[:, None], cnts


@jax.jit
def voxel_down_sample(
    points: jax.Array,
    mask: jax.Array,
    voxel_size: jax.Array,
    normals: Optional[jax.Array] = None,
    colors: Optional[jax.Array] = None,
):
    """Average points (and attributes) per voxel.

    Returns (points, normals, colors, out_mask) all of capacity N; valid
    outputs are a prefix-dense set of voxel means ordered by voxel key.
    """
    N = points.shape[0]
    voxel_size = jnp.asarray(voxel_size, jnp.float32)
    min_bound = masked_min(points, mask[:, None], axis=0) - voxel_size * 0.5
    cells = jnp.floor((points - min_bound) / voxel_size).astype(jnp.int32)
    big = jnp.int32(2**30)
    cells = jnp.where(mask[:, None], cells, big)
    order = jnp.lexsort((cells[:, 2], cells[:, 1], cells[:, 0]))
    sc = cells[order]
    sm = mask[order]
    prev = jnp.roll(sc, 1, axis=0)
    newseg = jnp.any(sc != prev, axis=1)
    newseg = newseg.at[0].set(True)
    seg_id = jnp.cumsum(newseg.astype(jnp.int32)) - 1
    w = sm.astype(jnp.float32)
    out_pts, cnts = _segment_mean(points[order], seg_id, w, N)
    out_mask = cnts > 0
    out_normals = out_colors = None
    if normals is not None:
        out_normals, _ = _segment_mean(normals[order], seg_id, w, N)
        nrm = jnp.linalg.norm(out_normals, axis=-1, keepdims=True)
        out_normals = out_normals / jnp.maximum(nrm, 1e-12)
    if colors is not None:
        out_colors, _ = _segment_mean(colors[order], seg_id, w, N)
    return out_pts, out_normals, out_colors, out_mask


# ---------------------------------------------------------------------------
# farthest point down-sample (reference: down_sample.cu FarthestPointDownSample)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_indices(
    points: jax.Array, mask: jax.Array, num_samples: int, start_index: int = 0
) -> jax.Array:
    """Iterative farthest-point sampling; returns [num_samples] indices."""
    N = points.shape[0]
    inf = jnp.float32(jnp.inf)

    def body(carry, _):
        min_d2, last = carry
        d = points - points[last]
        d2 = jnp.sum(d * d, -1)
        min_d2 = jnp.minimum(min_d2, d2)
        min_d2 = jnp.where(mask, min_d2, -inf)
        nxt = jnp.argmax(min_d2).astype(jnp.int32)
        return (min_d2, nxt), last

    init = (jnp.where(mask, inf, -inf), jnp.int32(start_index))
    _, picked = jax.lax.scan(body, init, None, length=num_samples)
    return picked


# ---------------------------------------------------------------------------
# normal estimation (reference: estimate_normals.cu:38-125)
# ---------------------------------------------------------------------------

@jax.jit
def covariances_from_neighbors(
    points: jax.Array, nbr_idx: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-point covariance over [N,k] neighbor indices (-1 invalid).

    Returns (cov [N,3,3], counts [N]). Mirrors the 9-cumulant trick of
    compute_cumulant_functor but as one fused gather + reduction.
    """
    valid = nbr_idx >= 0
    idx = jnp.clip(nbr_idx, 0, points.shape[0] - 1)
    nbr = points[idx]  # [N, k, 3]
    w = valid[..., None].astype(jnp.float32)
    cnt = jnp.sum(valid, -1)
    denom = jnp.maximum(cnt, 1).astype(jnp.float32)
    mean = jnp.sum(nbr * w, 1) / denom[:, None]
    second = jnp.einsum("nki,nkj->nij", nbr * w, nbr)  # sum x x^T
    cov = second / denom[:, None, None] - mean[:, None, :] * mean[:, :, None]
    return cov, cnt


@jax.jit
def normals_from_covariances(cov: jax.Array, counts: jax.Array) -> jax.Array:
    """Smallest-eigenvector normals; count<3 -> (0,0,1)."""
    _, vecs = ueigen.symeig3x3(cov)
    n = vecs[..., :, 0]
    nrm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    default = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape)
    bad = (counts < 3)[:, None] | (nrm[..., 0] < 1e-12)[:, None]
    return jnp.where(bad, default, n / jnp.maximum(nrm, 1e-12))


@jax.jit
def orient_normals_to_align_with_direction(
    normals: jax.Array, direction: jax.Array
) -> jax.Array:
    """reference: estimate_normals.cu align_normals_direction_functor."""
    direction = jnp.asarray(direction, normals.dtype)
    nrm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    zero = nrm[..., 0] < 1e-12
    dots = normals @ direction
    flipped = jnp.where((dots < 0)[:, None], -normals, normals)
    return jnp.where(zero[:, None], direction, flipped)


@jax.jit
def orient_normals_towards_camera_location(
    points: jax.Array, normals: jax.Array, camera: jax.Array
) -> jax.Array:
    to_cam = jnp.asarray(camera, points.dtype) - points
    nrm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    zero = nrm[..., 0] < 1e-12
    tc_norm = to_cam / jnp.maximum(jnp.linalg.norm(to_cam, -1, keepdims=True), 1e-12)
    dots = jnp.sum(normals * to_cam, -1)
    flipped = jnp.where((dots < 0)[:, None], -normals, normals)
    return jnp.where(zero[:, None], tc_norm, flipped)


# ---------------------------------------------------------------------------
# outlier removal (reference: down_sample.cu:317-430)
# ---------------------------------------------------------------------------

def radius_outlier_mask(points, mask, nb_points: int, radius) -> jax.Array:
    """Keep points with > nb_points neighbors (incl. self) in radius."""
    grid = gridhash.build_grid(points, radius, mask=mask)
    counts = gridhash.query_radius_count(grid, points, radius)
    return mask & (counts > nb_points)


@partial(jax.jit, static_argnames=("nb_neighbors",))
def statistical_outlier_mask(
    points: jax.Array, mask: jax.Array, nb_neighbors: int, std_ratio
) -> jax.Array:
    """Mean-kNN-distance test (reference RemoveStatisticalOutliers)."""
    _, d2 = bruteforce.knn_search(points, points, nb_neighbors, data_mask=mask)
    d = jnp.sqrt(jnp.where(jnp.isfinite(d2), d2, 0.0))
    cnt = jnp.sum(jnp.isfinite(d2), -1)
    avg = jnp.sum(d, -1) / jnp.maximum(cnt, 1)
    valid = mask & (cnt > 0)
    vm = valid.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(vm), 1.0)
    mean = jnp.sum(avg * vm) / n_valid
    var = jnp.sum((avg - mean) ** 2 * vm) / jnp.maximum(n_valid - 1.0, 1.0)
    thresh = mean + jnp.asarray(std_ratio, jnp.float32) * jnp.sqrt(var)
    return valid & (avg <= thresh)


# ---------------------------------------------------------------------------
# filters (reference: down_sample.cu GaussianFilter / PassThroughFilter)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_nn",))
def gaussian_filter(
    points: jax.Array, mask: jax.Array, radius, sigma2, max_nn: int = 32
) -> jax.Array:
    grid = gridhash.build_grid(points, radius, mask=mask)
    idx, d2, _ = gridhash.query_hybrid(grid, points, radius, max_nn)
    valid = idx >= 0
    nb = points[jnp.clip(idx, 0, points.shape[0] - 1)]
    w = jnp.exp(-0.5 * d2 / jnp.asarray(sigma2, jnp.float32))
    w = jnp.where(valid, w, 0.0)
    wsum = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-12)
    out = jnp.sum(nb * w[..., None], 1) / wsum
    return jnp.where(mask[:, None], out, points)


def pass_through_filter_mask(points, mask, axis_no: int, min_bound, max_bound):
    v = points[:, axis_no]
    return mask & (v >= min_bound) & (v <= max_bound)


# ---------------------------------------------------------------------------
# RANSAC plane segmentation (reference: segmentation.cu:81-235)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("num_iterations",))
def segment_plane(
    points: jax.Array,
    mask: jax.Array,
    distance_threshold,
    num_iterations: int,
    key: jax.Array,
):
    """Batched-hypothesis RANSAC.

    The reference evaluates hypotheses sequentially
    (segmentation.cu:81-235); on TPU we draw all ``num_iterations``
    triples at once and score every (hypothesis, point) pair in one
    [B, N] fused pass — same estimator, minus the host loop.
    Returns (plane [4], inlier_mask [N]).
    """
    N = points.shape[0]
    thr = jnp.asarray(distance_threshold, jnp.float32)
    valid_idx_p = jnp.where(mask, 0.0, -jnp.inf)
    # sample 3 distinct-ish indices per hypothesis among valid points
    gumbel = jax.random.gumbel(key, (num_iterations, N)) + valid_idx_p[None, :]
    _, triples = jax.lax.top_k(gumbel, 3)  # [B,3] distinct by construction
    p0 = points[triples[:, 0]]
    p1 = points[triples[:, 1]]
    p2 = points[triples[:, 2]]
    n = jnp.cross(p1 - p0, p2 - p0)
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(nn, 1e-12)
    d = -jnp.sum(n * p0, -1)  # plane: n.x + d = 0
    # distance of every point to every plane: one MXU matmul
    dist = jnp.abs(
        jnp.dot(points, n.T, precision=jax.lax.Precision.HIGHEST) + d[None, :]
    )  # [N, B]
    inl = (dist <= thr) & mask[:, None]
    counts = jnp.sum(inl, 0)
    counts = jnp.where(nn[:, 0] > 1e-12, counts, -1)
    best = jnp.argmax(counts)
    plane = jnp.concatenate([n[best], d[best][None]])
    inlier_mask = inl[:, best]
    return plane, inlier_mask


# ---------------------------------------------------------------------------
# DBSCAN (reference: pointcloud_cluster.cu:33-109, G-DBSCAN)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("min_points", "max_nn"))
def cluster_dbscan(
    points: jax.Array,
    mask: jax.Array,
    eps,
    min_points: int,
    max_nn: int = 64,
) -> jax.Array:
    """Density-based clustering via fixed-point min-label propagation.

    The reference runs BFS from each unvisited core point; we instead
    propagate the minimum point-index label across the epsilon-graph
    restricted to core points until convergence — identical clusters,
    but expressed as data-parallel sweeps XLA can fuse. Returns [N]
    labels (noise = -1) which are then densified host-side.
    """
    N = points.shape[0]
    grid = gridhash.build_grid(points, eps, mask=mask, bucket_cap=max(32, max_nn))
    idx, _, cnt = gridhash.query_hybrid(grid, points, eps, max_nn)
    core = mask & (cnt >= min_points)  # counts include self
    nbr_valid = idx >= 0
    idx_c = jnp.clip(idx, 0, N - 1)

    labels0 = jnp.where(core, jnp.arange(N, dtype=jnp.int32), jnp.int32(N))

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        nbr_lab = labels[idx_c]  # [N, k]
        # only labels of *core* neighbors propagate
        nbr_core = core[idx_c] & nbr_valid
        nbr_min = jnp.min(jnp.where(nbr_core, nbr_lab, N), -1)
        new = jnp.where(core, jnp.minimum(labels, nbr_min), labels)
        # border points adopt the best core neighbor's label
        new = jnp.where(mask & ~core, jnp.minimum(labels, nbr_min), new)
        # pointer jumping for O(log N) convergence
        new = jnp.where(new < N, new[jnp.clip(new, 0, N - 1)], new)
        changed = jnp.any(new != labels)
        return new, changed

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))
    return jnp.where(labels >= N, INVALID_INDEX, labels)


def densify_labels(labels) -> "jnp.ndarray":
    """Renumber cluster roots to 0..C-1 (host-side helper)."""
    import numpy as np

    lab = np.asarray(labels)
    out = np.full_like(lab, -1)
    uniq = np.unique(lab[lab >= 0])
    remap = {int(u): i for i, u in enumerate(uniq)}
    for u, i in remap.items():
        out[lab == u] = i
    return out
