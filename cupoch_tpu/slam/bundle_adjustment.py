"""Distributed Schur-complement bundle adjustment.

New scope (SURVEY.md §7.9 / BASELINE.json north star): landmarks ("map
blocks") and their observations are partitioned across the device
mesh; each device builds its partial reduced camera system

    S = Σ_l (H_cc^l - H_cl H_ll^-1 H_lc),   g = Σ_l (b_c^l - H_cl H_ll^-1 b_l)

over its landmark shard. One `psum` over ICI reduces (S, g); every
device solves the identical [6C, 6C] system and applies the same pose
update, then back-substitutes its own landmarks locally — landmark
updates need only local observations, so the per-iteration
communication is exactly the reduced camera system, independent of
map size. This is the classic distributed Schur reduction expressed as
shard_map + psum.

Projection model: pinhole (fx, fy, cx, cy), poses are world→camera
extrinsics T, residual = π(T·X) - uv.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utility import console
from ..utility.transforms import exp_se3

BLOCK_AXIS = "blocks"


class BAProblem(NamedTuple):
    """Sharded-friendly SoA bundle-adjustment problem.

    poses:        [C, 4, 4]  world→camera extrinsics (replicated)
    points:       [L, 3]     landmarks (sharded on BLOCK_AXIS)
    observations: per-observation arrays, grouped so that every
                  landmark's observations live in its own shard:
      obs_cam:    [L, K] int32 camera index (-1 = empty slot)
      obs_uv:     [L, K, 2] pixel measurements
    intrinsics:   [4] fx, fy, cx, cy
    """

    poses: jax.Array
    points: jax.Array
    obs_cam: jax.Array
    obs_uv: jax.Array
    intrinsics: jax.Array


def _project(T, X, intr):
    """π(T·X): world point to pixel."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    pc = T[:3, :3] @ X + T[:3, 3]
    z = jnp.maximum(pc[2], 1e-6)
    return jnp.stack([fx * pc[0] / z + cx, fy * pc[1] / z + cy]), pc


def _residual_jacobians(poses, intr, X, cam_idx, uv):
    """Per-observation residual + jacobians wrt camera twist (6) and
    point (3), computed in closed form."""
    T = poses[cam_idx]
    fx, fy = intr[0], intr[1]
    pred, pc = _project(T, X, intr)
    r = pred - uv
    x, y, z = pc[0], pc[1], jnp.maximum(pc[2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    # d pixel / d pc (camera-frame point)
    J_pc = jnp.asarray([[fx * iz, 0.0, -fx * x * iz2],
                        [0.0, fy * iz, -fy * y * iz2]])
    # d pc / d twist for left perturbation exp(xi) T with xi = [w, v]
    # (exp_se3's rotation-first ordering): dpc = dw x pc + dv
    pc_hat = jnp.asarray([[0.0, -pc[2], pc[1]],
                          [pc[2], 0.0, -pc[0]],
                          [-pc[1], pc[0], 0.0]])
    J_pose = jnp.concatenate([-J_pc @ pc_hat, J_pc], -1)  # [2, 6]
    J_point = J_pc @ T[:3, :3]  # [2, 3]
    return r, J_pose, J_point


def _local_schur(poses, points, obs_cam, obs_uv, intr, n_cams: int, lam):
    """Partial Schur system over this device's landmark shard.

    Per-landmark pieces are computed under vmap and scattered into the
    [C,6,C,6] camera system with ONE indexed add (not per landmark), so
    memory stays O(L·K² + C²)."""
    L, K = obs_cam.shape

    def per_landmark(X, cams, uvs):
        valid = cams >= 0
        cidx = jnp.clip(cams, 0, n_cams - 1)
        r, J_pose, J_point = jax.vmap(
            lambda c, uv: _residual_jacobians(poses, intr, X, c, uv)
        )(cidx, uvs)  # r [K,2], J_pose [K,2,6], J_point [K,2,3]
        w = valid.astype(jnp.float32)[:, None, None]
        Jp = J_pose * w
        Jx = J_point * w
        rw = r * valid[:, None]
        H_ll = jnp.einsum("kri,krj->ij", Jx, J_point) \
            + lam * jnp.eye(3)                       # [3, 3]
        b_l = jnp.einsum("kri,kr->i", Jx, r)
        H_cl = jnp.einsum("kri,krj->kij", Jp, J_point)  # [K, 6, 3]
        H_cc = jnp.einsum("kri,krj->kij", Jp, J_pose)   # [K, 6, 6]
        b_c = jnp.einsum("kri,kr->ki", Jp, rw)          # [K, 6]
        H_ll_inv = jnp.linalg.inv(H_ll)
        # cross term: - H_cl H_ll^-1 H_lc couples every camera pair
        # seeing this landmark
        A = jnp.einsum("kij,jl->kil", H_cl, H_ll_inv)   # [K, 6, 3]
        cross = jnp.einsum("kil,mjl->kmij", A, H_cl)    # [K,K,6,6]
        pairw = (valid[:, None] & valid[None, :]).astype(jnp.float32)
        cross = cross * pairw[..., None, None]
        g_l = b_c - jnp.einsum("kil,l->ki", A, b_l)     # [K, 6]
        err = jnp.sum(rw * rw)
        return H_cc, cross, g_l, cidx, H_ll_inv, b_l, A, err

    H_cc, cross, g_l, cidx, H_ll_inv, b_l, A, err = jax.vmap(per_landmark)(
        points, obs_cam, obs_uv)
    # one global scatter over all (landmark, obs) pieces
    S = jnp.zeros((n_cams, 6, n_cams, 6))
    g = jnp.zeros((n_cams, 6))
    S = S.at[cidx, :, cidx, :].add(H_cc)          # [L,K] diag blocks
    ci = jnp.broadcast_to(cidx[:, :, None], (L, K, K))
    cj = jnp.broadcast_to(cidx[:, None, :], (L, K, K))
    S = S.at[ci, :, cj, :].add(-cross)            # [L,K,K] cross blocks
    g = g.at[cidx].add(g_l)
    return S, g, H_ll_inv, b_l, A, jnp.sum(err)


def _back_substitute(points, obs_cam, H_ll_inv, b_l, A, dx_cam, n_cams):
    """dX_l = -H_ll^-1 (b_l + H_lc dx_c) with only local observations."""
    L, K = obs_cam.shape
    cidx = jnp.clip(obs_cam, 0, n_cams - 1)
    valid = (obs_cam >= 0).astype(jnp.float32)
    dxc = dx_cam.reshape(n_cams, 6)[cidx] * valid[..., None]  # [L, K, 6]
    # H_lc dx_c = Σ_k (H_cl^k)^T dx_c^k ; A = H_cl H_ll^-1 so
    # H_ll^-1 H_lc dx = Σ_k A_k^T dx_k
    corr = jnp.einsum("lkij,lki->lj", A, dxc)
    dX = -(jnp.einsum("lij,lj->li", H_ll_inv, b_l) + corr)
    return points + dX


def _solve_camera_system(S, g, lam, n_cams: int):
    """Reduced-camera solve with camera 0 held fixed: the anchored
    block is eliminated (well-conditioned in float32) instead of
    clamped with a huge diagonal."""
    Sf = S.reshape(n_cams * 6, n_cams * 6)
    Sr = Sf[6:, 6:] + lam * jnp.eye((n_cams - 1) * 6)
    dxr = -jnp.linalg.solve(Sr, g.reshape(-1)[6:])
    return jnp.concatenate([jnp.zeros(6), dxr])


@partial(jax.jit, static_argnames=("n_cams", "iterations"))
def _ba_iterate(poses, points, obs_cam, obs_uv, intr, lam,
                n_cams: int, iterations: int):
    def body(_, state):
        poses, points, _ = state
        S, g, H_ll_inv, b_l, A, err = _local_schur(
            poses, points, obs_cam, obs_uv, intr, n_cams, lam)
        dx = _solve_camera_system(S, g, lam, n_cams)
        new_poses = jnp.einsum(
            "nij,njk->nik",
            jax.vmap(exp_se3)(dx.reshape(n_cams, 6)), poses)
        new_points = _back_substitute(points, obs_cam, H_ll_inv, b_l, A,
                                      dx, n_cams)
        return new_poses, new_points, err

    return jax.lax.fori_loop(
        0, iterations, body, (poses, points, jnp.float32(0.0)))


def _ba_iterate_sharded(mesh, poses, points, obs_cam, obs_uv, intr, lam,
                        n_cams: int, iterations: int):
    def local(poses, points, obs_cam, obs_uv):
        def body(_, state):
            poses, points, _ = state
            S, g, H_ll_inv, b_l, A, err = _local_schur(
                poses, points, obs_cam, obs_uv, intr, n_cams, lam)
            # the distributed Schur reduction: one psum of (S, g)
            S = jax.lax.psum(S, BLOCK_AXIS)
            g = jax.lax.psum(g, BLOCK_AXIS)
            err = jax.lax.psum(err, BLOCK_AXIS)
            dx = _solve_camera_system(S, g, lam, n_cams)
            new_poses = jnp.einsum(
                "nij,njk->nik",
                jax.vmap(exp_se3)(dx.reshape(n_cams, 6)), poses)
            # back-substitution is purely local to the landmark shard
            new_points = _back_substitute(points, obs_cam, H_ll_inv, b_l,
                                          A, dx, n_cams)
            return new_poses, new_points, err

        return jax.lax.fori_loop(
            0, iterations, body, (poses, points, jnp.float32(0.0)))

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=(P(), P(BLOCK_AXIS), P()),
        check_vma=False,
    ))
    ns = NamedSharding(mesh, P(BLOCK_AXIS))
    points = jax.device_put(points, ns)
    obs_cam = jax.device_put(obs_cam, ns)
    obs_uv = jax.device_put(obs_uv, ns)
    return fn(poses, points, obs_cam, obs_uv)


def make_block_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the landmark/map-block axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BLOCK_AXIS,))


def bundle_adjustment(problem: BAProblem, iterations: int = 10,
                      damping: float = 1e-4,
                      mesh: Optional[Mesh] = None):
    """Runs GN-with-Schur; returns (poses, points, final_err).

    With `mesh`, the landmark dimension must be a multiple of the mesh
    size (pad with empty-observation landmarks).
    """
    n_cams = int(problem.poses.shape[0])
    if mesh is None:
        poses, points, err = _ba_iterate(
            problem.poses, problem.points, problem.obs_cam, problem.obs_uv,
            problem.intrinsics, jnp.float32(damping), n_cams, iterations)
    else:
        poses, points, err = _ba_iterate_sharded(
            mesh, problem.poses, problem.points, problem.obs_cam,
            problem.obs_uv, problem.intrinsics, jnp.float32(damping),
            n_cams, iterations)
    return poses, points, float(err)


def reprojection_rmse(problem: BAProblem, poses=None, points=None) -> float:
    poses = problem.poses if poses is None else poses
    points = problem.points if points is None else points

    def per_obs(X, cams, uvs):
        valid = cams >= 0
        cidx = jnp.clip(cams, 0, poses.shape[0] - 1)
        pred = jax.vmap(
            lambda c, uv: _project(poses[c], X, problem.intrinsics)[0]
        )(cidx, uvs)
        r = (pred - uvs) * valid[:, None]
        return jnp.sum(r * r), jnp.sum(valid)

    e2, n = jax.vmap(per_obs)(points, problem.obs_cam, problem.obs_uv)
    return float(jnp.sqrt(jnp.sum(e2) / jnp.maximum(jnp.sum(n), 1)))
