"""Transformation estimators for ICP.

reference: src/cupoch/registration/transformation_estimation.h:38-143 /
transformation_estimation.cu. Each estimator produces an incremental
4x4 update from the current correspondence set:

  PointToPoint  — Kabsch SVD (kabsch.py)
  PointToPlane  — Gauss-Newton on r = (vs - vt) . nt, J = [vs x nt, nt]
  SymmetricMethod — Rusinkiewicz symmetric objective:
                  r = (vs - vt) . (ns + nt), J = [(vs + vt) x n, n]

All are pure functions over fixed-shape arrays with a validity weight
per source point, so they can live inside the ICP `lax.while_loop`.
"""
from __future__ import annotations

import enum
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utility import eigen as ueigen
from .kabsch import kabsch_weighted


class TransformationEstimationType(enum.IntEnum):
    # values match reference transformation_estimation.h:41-48
    Unspecified = 0
    PointToPoint = 1
    PointToPlane = 2
    SymmetricMethod = 3
    ColoredICP = 4
    GeneralizedICP = 5


class TransformationEstimation:
    def get_transformation_estimation_type(self) -> TransformationEstimationType:
        raise NotImplementedError


class TransformationEstimationPointToPoint(TransformationEstimation):
    def __init__(self, with_scaling: bool = False):
        self.with_scaling = with_scaling

    def get_transformation_estimation_type(self):
        return TransformationEstimationType.PointToPoint


class TransformationEstimationPointToPlane(TransformationEstimation):
    def __init__(self, det_thresh: float = 1e-6):
        self.det_thresh = det_thresh

    def get_transformation_estimation_type(self):
        return TransformationEstimationType.PointToPlane


class TransformationEstimationSymmetricMethod(TransformationEstimation):
    def __init__(self, det_thresh: float = 1e-6):
        self.det_thresh = det_thresh

    def get_transformation_estimation_type(self):
        return TransformationEstimationType.SymmetricMethod


class TransformationEstimationForColoredICP(TransformationEstimation):
    """reference: colored_icp.cu:41-66 (lambda clamp included)."""

    def __init__(self, lambda_geometric: float = 0.968,
                 det_thresh: float = 1e-6):
        if lambda_geometric < 0.0 or lambda_geometric > 1.0:
            lambda_geometric = 0.968
        self.lambda_geometric = float(lambda_geometric)
        self.det_thresh = det_thresh

    def get_transformation_estimation_type(self):
        return TransformationEstimationType.ColoredICP


class TransformationEstimationForGeneralizedICP(TransformationEstimation):
    """reference: generalized_icp.h:14-45 (epsilon = covariance along
    the normal)."""

    def __init__(self, epsilon: float = 1e-3):
        self.epsilon = float(epsilon)

    def get_transformation_estimation_type(self):
        return TransformationEstimationType.GeneralizedICP


# ---------------------------------------------------------------------------
# functional update kernels; inputs are gathered correspondence pairs
# ---------------------------------------------------------------------------

def update_point_to_point(src, dst, dst_normals, src_normals, w) -> jax.Array:
    return kabsch_weighted(src, dst, w)


def _gn_update(J: jax.Array, r: jax.Array, w: jax.Array) -> jax.Array:
    Jw = J * w[:, None]
    JTJ = jnp.dot(Jw.T, J, precision=jax.lax.Precision.HIGHEST)
    JTr = Jw.T @ r
    ok, T = ueigen.solve_jacobian_system(JTJ, JTr)
    return T


def update_point_to_plane(src, dst, dst_normals, src_normals, w) -> jax.Array:
    """reference: pt2pl_jacobian_residual_functor
    (transformation_estimation.cu:34-57)."""
    r = jnp.sum((src - dst) * dst_normals, -1)
    J = jnp.concatenate([jnp.cross(src, dst_normals), dst_normals], -1)
    return _gn_update(J, r, w)


def update_symmetric(src, dst, dst_normals, src_normals, w) -> jax.Array:
    """reference: symmetric_jacobian_residual_functor
    (transformation_estimation.cu:59-93)."""
    n = src_normals + dst_normals
    r = jnp.sum((src - dst) * n, -1)
    J = jnp.concatenate([jnp.cross(src + dst, n), n], -1)
    return _gn_update(J, r, w)


def update_colored(src_t, dst, dst_normals, src_intensity, dst_intensity,
                   dst_grad, w, sqrt_lg, sqrt_lp) -> jax.Array:
    """Joint geometric + photometric GN step (reference:
    compute_jacobian_and_residual_functor, colored_icp.cu:150-216).
    Intensities are precomputed (they are transform-invariant)."""
    nt = dst_normals
    d = src_t - dst
    dn = jnp.sum(d * nt, -1)
    # geometric row (= point-to-plane scaled by sqrt(lambda_g))
    r_g = sqrt_lg * dn
    J_g = sqrt_lg * jnp.concatenate([jnp.cross(src_t, nt), nt], -1)
    # photometric row: project src into target tangent plane, compare
    # the gradient-extrapolated target intensity with the source's
    vs_proj = src_t - dn[:, None] * nt
    is0_proj = jnp.sum(dst_grad * (vs_proj - dst), -1) + dst_intensity
    # M = I - nt nt^T projects the gradient into the tangent plane
    ditM = -(dst_grad - jnp.sum(dst_grad * nt, -1, keepdims=True) * nt)
    r_p = sqrt_lp * (src_intensity - is0_proj)
    J_p = sqrt_lp * jnp.concatenate([jnp.cross(src_t, ditM), ditM], -1)
    J = jnp.concatenate([J_g, J_p], 0)
    r = jnp.concatenate([r_g, r_p], 0)
    return _gn_update(J, r, jnp.concatenate([w, w], 0))


def update_gicp(src_t, src_cov_t, dst, dst_cov, w) -> jax.Array:
    """Plane-to-plane Mahalanobis GN step (reference:
    generalized_icp.cu:64-106). W = sqrtm((Ct + Cs)^-1) whitens the
    3-row point residual."""
    from ..utility.eigen import sqrtm_psd3

    d = src_t - dst
    M_inv = jnp.linalg.inv(dst_cov + src_cov_t)          # [K,3,3]
    W = sqrtm_psd3(M_inv)
    # J0 = [-skew(vs) | I]; rows whitened by W
    K = src_t.shape[0]
    skew = jnp.zeros((K, 3, 3), src_t.dtype)
    x, y, z = src_t[:, 0], src_t[:, 1], src_t[:, 2]
    skew = jnp.stack([
        jnp.stack([jnp.zeros_like(x), -z, y], -1),
        jnp.stack([z, jnp.zeros_like(x), -x], -1),
        jnp.stack([-y, x, jnp.zeros_like(x)], -1),
    ], 1)
    J0 = jnp.concatenate([-skew, jnp.broadcast_to(
        jnp.eye(3, dtype=src_t.dtype), (K, 3, 3))], -1)  # [K,3,6]
    J = jnp.matmul(W, J0, precision=jax.lax.Precision.HIGHEST)  # [K,3,6]
    r = jnp.matmul(W, d[..., None],
                   precision=jax.lax.Precision.HIGHEST)[..., 0]  # [K,3]
    Jf = (J * w[:, None, None]).reshape(-1, 6)
    J2 = J.reshape(-1, 6)
    rf = r.reshape(-1)
    JTJ = jnp.dot(Jf.T, J2, precision=jax.lax.Precision.HIGHEST)
    JTr = Jf.T @ rf
    ok, T = ueigen.solve_jacobian_system(JTJ, JTr)
    return T


UPDATE_FNS = {
    TransformationEstimationType.PointToPoint: update_point_to_point,
    TransformationEstimationType.PointToPlane: update_point_to_plane,
    TransformationEstimationType.SymmetricMethod: update_symmetric,
}
