"""Colored ICP (Park, Zhou, Koltun — ICCV 2017).

reference: src/cupoch/registration/colored_icp.cu. The per-point
virtual color-gradient precompute (colored_icp.cu:73-147) becomes one
vectorised [N, max_nn] batch with a batched 3x3 solve; the joint
geometric+photometric Gauss-Newton runs inside the shared
`_icp_core` while_loop (registration.py) via `update_colored`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..knn import KDTreeSearchParamRadius, search_neighbors
from ..utility import console


def intensity(colors: jax.Array) -> jax.Array:
    """Scalar intensity = mean(R,G,B) (colors are [N,3] in [0,1])."""
    return jnp.mean(colors, -1)


@jax.jit
def _color_gradient_kernel(points, normals, intens, idx):
    """reference: compute_color_gradient_functor (colored_icp.cu:73-118)."""
    N = points.shape[0]
    self_idx = jnp.arange(N, dtype=jnp.int32)[:, None]
    valid = (idx >= 0) & (idx != self_idx)
    safe = jnp.clip(idx, 0, N - 1)
    vt = points[:, None, :]                    # [N,1,3]
    nt = normals                               # [N,3]
    vt_adj = points[safe]                      # [N,K,3]
    it_adj = intens[safe]                      # [N,K]
    # project neighbors into the tangent plane of vt
    off = vt_adj - vt
    vt_proj = vt_adj - jnp.sum(off * nt[:, None, :], -1, keepdims=True) * nt[:, None, :]
    vtmp = vt_proj - vt                        # [N,K,3]
    w = valid.astype(jnp.float32)[..., None]
    vtmp_m = vtmp * w
    AtA = jnp.einsum("nki,nkj->nij", vtmp_m, vtmp,
                     precision=jax.lax.Precision.HIGHEST)
    Atb = jnp.einsum("nk,nki->ni", (it_adj - intens[:, None]) * w[..., 0], vtmp,
                     precision=jax.lax.Precision.HIGHEST)
    nn = jnp.sum(valid, -1).astype(jnp.float32)
    # orthogonal constraint along the normal (colored_icp.cu:112-114)
    AtA = AtA + ((nn - 1.0) ** 2)[:, None, None] * jnp.einsum(
        "ni,nj->nij", nt, nt)
    AtA = AtA + 1e-6 * jnp.eye(3, dtype=jnp.float32)
    grad = jnp.linalg.solve(AtA, Atb[..., None])[..., 0]
    return jnp.where((nn >= 4.0)[:, None], grad, 0.0)


def compute_color_gradient(target, radius: float, max_nn: int = 30):
    """[M,3] per-point color gradient of the target
    (reference: InitializePointCloudForColoredICP, colored_icp.cu:120-148)."""
    if not target.has_colors() or not target.has_normals():
        console.log_error(
            "[ColoredICP] target needs both colors and normals.")
    idx, _ = search_neighbors(
        target.points, target.points, KDTreeSearchParamRadius(radius, max_nn))
    return _color_gradient_kernel(
        target.points, target.normals, intensity(target.colors), idx)


def registration_colored_icp(
    source,
    target,
    max_distance: float,
    init=None,
    criteria=None,
    lambda_geometric: float = 0.968,
    det_thresh: float = 1e-6,
):
    """reference: RegistrationColoredICP (colored_icp.cu:329-342)."""
    from .estimation import TransformationEstimationForColoredICP
    from .registration import registration_icp

    return registration_icp(
        source, target, max_distance, init,
        TransformationEstimationForColoredICP(lambda_geometric, det_thresh),
        criteria)
