"""ISS keypoint detection (reference: src/cupoch/geometry/keypoint.h +
iss_keypoints.cu:69-118).

Intrinsic Shape Signatures: per-point covariance over a salient-radius
neighborhood, eigenvalue-ratio test (λ2/λ1 < γ21, λ3/λ2 < γ32 with
λ1 ≥ λ2 ≥ λ3), saliency = λ3, then non-maximum suppression over a
non-max-radius neighborhood. Both neighborhoods are [N, max_nn] padded
index arrays from the shared search backends, so the whole detector is
a single fused jit program (gather + einsum + symeig + masked max).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..knn import NUM_MAX_NN, KDTreeSearchParamHybrid, search_neighbors
from ..knn.bruteforce import knn_search
from ..utility import console
from ..utility import eigen as ueigen
from . import pointcloud_ops as ops


@jax.jit
def _third_eigen_values(points, nbr_idx, min_neighbors):
    """Saliency per point: smallest covariance eigenvalue, or -1 if the
    ratio test / min-neighbor test fails
    (compute_third_eigen_values_functor, iss_keypoints.cu:69-89)."""
    cov, cnt = ops.covariances_from_neighbors(points, nbr_idx)
    eigs, _ = ueigen.symeig3x3(cov)  # ascending: e0 <= e1 <= e2
    e0, e1, e2 = eigs[..., 0], eigs[..., 1], eigs[..., 2]
    return e0, e1, e2, cnt


@jax.jit
def _nms(saliency, nbr_idx):
    """Local maxima over the non-max neighborhood
    (is_local_maxima_functor, iss_keypoints.cu:91-107)."""
    valid = nbr_idx >= 0
    idx = jnp.clip(nbr_idx, 0, saliency.shape[0] - 1)
    nbr_sal = jnp.where(valid, saliency[idx], -jnp.inf)
    return (saliency >= 0) & jnp.all(saliency[:, None] >= nbr_sal, -1)


def compute_model_resolution(points, mask=None) -> float:
    """Mean nearest-neighbor distance (ComputeModelResolution,
    iss_keypoints.cu:33-49)."""
    idx, d2 = knn_search(points, points, 2, data_mask=mask)
    nn_d2 = np.asarray(d2[:, 1])
    valid = np.asarray(idx[:, 1]) >= 0
    if not valid.any():
        return 0.0
    return float(np.sqrt(nn_d2[valid].mean()))


def compute_iss_keypoints(
    pcd,
    salient_radius: float = 0.0,
    non_max_radius: float = 0.0,
    gamma_21: float = 0.975,
    gamma_32: float = 0.975,
    min_neighbors: int = 5,
    max_neighbors: int = NUM_MAX_NN,
) -> Tuple["object", np.ndarray]:
    """Returns (keypoint PointCloud, [N] bool mask)
    (keypoint::ComputeISSKeypoints, iss_keypoints.cu:109+)."""
    from .pointcloud import PointCloud

    if pcd.is_empty():
        console.log_warning("[ComputeISSKeypoints] Input PointCloud is empty!")
        return PointCloud(), np.zeros(0, bool)
    points = jnp.asarray(pcd.points, jnp.float32)
    if salient_radius == 0.0 or non_max_radius == 0.0:
        resolution = compute_model_resolution(points)
        salient_radius = 6.0 * resolution
        non_max_radius = 4.0 * resolution
        console.log_debug(
            "[ComputeISSKeypoints] Computed salient_radius = %g, "
            "non_max_radius = %g from input model",
            salient_radius, non_max_radius)

    nbr_idx, _ = search_neighbors(
        points, points, KDTreeSearchParamHybrid(salient_radius, max_neighbors))
    e0, e1, e2, cnt = _third_eigen_values(points, nbr_idx, min_neighbors)
    ok = ((cnt >= min_neighbors) & (e2 > 0)
          & (e1 / jnp.maximum(e2, 1e-30) < gamma_21)
          & (e0 / jnp.maximum(e1, 1e-30) < gamma_32))
    saliency = jnp.where(ok, e0, -1.0)

    nms_idx, _ = search_neighbors(
        points, points,
        KDTreeSearchParamHybrid(non_max_radius, max_neighbors))
    keep = np.asarray(_nms(saliency, nms_idx))

    out = PointCloud(np.asarray(points)[keep])
    if pcd.has_normals():
        out.normals = np.asarray(pcd.normals)[keep]
    if pcd.has_colors():
        out.colors = np.asarray(pcd.colors)[keep]
    console.log_debug("[ComputeISSKeypoints] Extracted %d keypoints",
                      int(keep.sum()))
    return out, keep
