"""Multi-chip registration building blocks.

New scope vs the single-GPU reference (SURVEY.md §2.13): point-parallel
ICP over a `jax.sharding.Mesh`. Source points are sharded across
devices on the "points" axis; the target cloud (or its hash grid) is
replicated. Each device computes correspondences and partial
Gauss-Newton moments for its shard; `psum` over ICI reduces the 6x6
system, and every device solves the same tiny system — the classic
data-parallel GN layout, communicating 42 floats per iteration
regardless of cloud size.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..knn import bruteforce
from ..utility import eigen as ueigen
from ..utility.transforms import transform_points

POINTS_AXIS = "points"


def make_point_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D device mesh over the point-sharding axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (POINTS_AXIS,))


def _local_gn_moments(src_t, src_mask, tgt, tgt_mask, max_dist, tgt_normals):
    """Per-shard correspondence + point-to-plane GN moments."""
    idx, d2 = bruteforce.nn_search(src_t, tgt, data_mask=tgt_mask)
    ok = src_mask & (d2 <= max_dist ** 2)
    ti = jnp.clip(idx, 0, tgt.shape[0] - 1)
    vt = tgt[ti]
    nt = tgt_normals[ti]
    r = jnp.sum((src_t - vt) * nt, -1)
    J = jnp.concatenate([jnp.cross(src_t, nt), nt], -1)
    w = ok.astype(jnp.float32)
    Jw = J * w[:, None]
    JTJ = jnp.dot(Jw.T, J, precision=jax.lax.Precision.HIGHEST)
    JTr = Jw.T @ r
    err2 = jnp.sum(jnp.where(ok, d2, 0.0))
    cnt = jnp.sum(w)
    return JTJ, JTr, err2, cnt


def sharded_icp_step(mesh: Mesh):
    """Build a pjit-ed single ICP iteration over ``mesh``.

    Returns fn(src [N,3] sharded, src_mask, tgt [M,3] replicated,
    tgt_mask, tgt_normals, T) -> (T', fitness, rmse).
    """

    def local_step(src, src_mask, tgt, tgt_mask, tgt_normals, T):
        src_t = transform_points(T, src)
        JTJ, JTr, err2, cnt = _local_gn_moments(
            src_t, src_mask, tgt, tgt_mask, jnp.float32(0.3), tgt_normals)
        # the only cross-device communication: reduce the 6x6 system
        JTJ = jax.lax.psum(JTJ, POINTS_AXIS)
        JTr = jax.lax.psum(JTr, POINTS_AXIS)
        err2 = jax.lax.psum(err2, POINTS_AXIS)
        cnt = jax.lax.psum(cnt, POINTS_AXIS)
        n_src = jax.lax.psum(jnp.sum(src_mask.astype(jnp.float32)), POINTS_AXIS)
        ok, update = ueigen.solve_jacobian_system(JTJ, JTr)
        T_new = update @ T
        fitness = cnt / jnp.maximum(n_src, 1.0)
        rmse = jnp.sqrt(err2 / jnp.maximum(cnt, 1.0))
        return T_new, fitness, rmse

    shard = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(POINTS_AXIS), P(POINTS_AXIS), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shard)


def sharded_transform(mesh: Mesh):
    """pjit point transform with points sharded across the mesh."""

    @partial(jax.jit,
             in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P(POINTS_AXIS))),
             out_shardings=NamedSharding(mesh, P(POINTS_AXIS)))
    def fn(T, points):
        return transform_points(T, points)

    return fn
