"""Generalized ICP (Segal, Haehnel, Thrun — RSS 2009).

reference: src/cupoch/registration/generalized_icp.{h,cu}. Per-point
plane-regularized covariances (epsilon,1,1 spectra rotated to the
normal frame, generalized_icp.cu:38-63) are batched matmuls; the
Mahalanobis plane-to-plane GN step runs inside the shared `_icp_core`
while_loop via `update_gicp`, with the source covariances re-rotated by
the cumulative pose each iteration.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..knn import KDTreeSearchParamKNN
from ..utility import console
from ..utility.eigen import rotation_e1_to_x


@jax.jit
def covariances_from_normals(normals: jax.Array, epsilon) -> jax.Array:
    """C = R_x diag(eps, 1, 1) R_x^T with R_x rotating e1 onto the
    normal (reference: InitializePointCloudForGeneralizedICP,
    generalized_icp.cu:50-61)."""
    Rx = rotation_e1_to_x(normals)
    d = jnp.stack([jnp.broadcast_to(jnp.asarray(epsilon, jnp.float32),
                                    normals.shape[:-1]),
                   jnp.ones(normals.shape[:-1], jnp.float32),
                   jnp.ones(normals.shape[:-1], jnp.float32)], -1)
    return jnp.einsum("...ij,...j,...kj->...ik", Rx, d, Rx,
                      precision=jax.lax.Precision.HIGHEST)


def initialize_cloud_for_gicp(pcd, epsilon: float):
    """Returns per-point [N,3,3] covariances for GICP (reference:
    InitializePointCloudForGeneralizedICP, generalized_icp.cu:37-62):
    pre-computed covariances win; else derive from (possibly freshly
    estimated 20-NN) normals."""
    if pcd.has_covariances():
        return pcd.covariances
    if pcd.has_normals():
        normals = pcd.normals
    else:
        from ..geometry.pointcloud import PointCloud

        tmp = PointCloud(pcd.points)
        tmp.estimate_normals(KDTreeSearchParamKNN(20))
        normals = tmp.normals
    return covariances_from_normals(normals, jnp.float32(epsilon))


def registration_generalized_icp(
    source,
    target,
    max_distance: float,
    init=None,
    estimation=None,
    criteria=None,
):
    """reference: RegistrationGeneralizedICP (generalized_icp.cu:185-196)."""
    from .estimation import TransformationEstimationForGeneralizedICP
    from .registration import registration_icp

    estimation = estimation or TransformationEstimationForGeneralizedICP()
    return registration_icp(
        source, target, max_distance, init, estimation, criteria)
