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


UPDATE_FNS = {
    TransformationEstimationType.PointToPoint: update_point_to_point,
    TransformationEstimationType.PointToPlane: update_point_to_plane,
    TransformationEstimationType.SymmetricMethod: update_symmetric,
}
