"""Jit-safe TSDF kernels over dense [R, R, R] grids.

reference: src/cupoch/integration/integrate_functor.h:85-140 (per-voxel
projective update), uniform_tsdfvolume.cu:120-240 (zero-crossing point
extraction), :410-600 (raycast sphere tracing). The reference launches
one thread per voxel/pixel; here each pass is one fused XLA program
over the whole grid — projective integrate is a pure gather+elementwise
pipeline, raycast is a `fori_loop` of trilinear samples over all pixels
at once.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import numpy as np
import jax.numpy as jnp

from .tsdfvolume import TSDFVolumeColorType


def _voxel_centers(resolution: int, voxel_length, origin):
    r = jnp.arange(resolution, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(r, r, r, indexing="ij")
    half = 0.5 * voxel_length
    return (jnp.stack([gx, gy, gz], -1) * voxel_length + half
            + origin)  # [R,R,R,3]


@partial(jax.jit, static_argnames=("resolution", "color_channels"))
def integrate(tsdf, weight, color_vol, depth, color_img, multiplier,
              K, extrinsic, voxel_length, sdf_trunc, origin,
              resolution: int, color_channels: int):
    """One projective TSDF update (reference: integrate_functor.h:85-140).

    depth: [H,W] metres (0 = invalid). color_img: [H,W,C] float.
    multiplier: [H,W] z-depth -> ray-distance factor.
    """
    H, W = depth.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    pts = _voxel_centers(resolution, voxel_length, origin)
    R_ = extrinsic[:3, :3]
    t_ = extrinsic[:3, 3]
    pc = pts @ R_.T + t_  # [R,R,R,3] camera-frame
    z = pc[..., 2]
    safe_z = jnp.where(z > 1e-8, z, 1.0)
    # +0.5 then floor = round to nearest pixel (integrate_functor.h:103)
    u_f = pc[..., 0] * fx / safe_z + cx + 0.5
    v_f = pc[..., 1] * fy / safe_z + cy + 0.5
    in_img = ((u_f >= 1e-4) & (u_f < W - 1e-4) &
              (v_f >= 1e-4) & (v_f < H - 1e-4) & (z > 0))
    u = jnp.clip(u_f.astype(jnp.int32), 0, W - 1)
    v = jnp.clip(v_f.astype(jnp.int32), 0, H - 1)
    d = depth[v, u]
    mult = multiplier[v, u]
    sdf = (d - z) * mult
    update = in_img & (d > 0.0) & (sdf > -sdf_trunc)
    tsdf_new = jnp.minimum(1.0, sdf / sdf_trunc)
    w = weight
    w1 = w + 1.0
    tsdf_out = jnp.where(update, (tsdf * w + tsdf_new) / w1, tsdf)
    weight_out = jnp.where(update, w1, w)
    if color_channels > 0:
        cimg = color_img[v, u]  # [R,R,R,C]
        cv = color_vol
        c_out = jnp.where(update[..., None],
                          (cv * w[..., None] + cimg) / w1[..., None], cv)
    else:
        c_out = color_vol
    return tsdf_out, weight_out, c_out


@partial(jax.jit, static_argnames=("resolution",))
def surface_crossings(tsdf, weight, voxel_length, origin, resolution: int):
    """Zero-crossing candidate mask per (voxel, axis).

    reference: extract_pointcloud_functor (uniform_tsdfvolume.cu:
    110-170): a surface point exists between voxel i and i+1 along an
    axis when both have weight > 0 and the tsdf changes sign; |f|<0.98
    gates the base voxel. Returns ([R,R,R,3] crossing mask,
    [R,R,R,3] interpolation fraction, [R,R,R,3] gradient for normals).
    """
    f = tsdf
    w = weight
    valid = (w > 0.0) & (jnp.abs(f) < 0.98)

    masks = []
    fracs = []
    for axis in range(3):
        fn = jnp.roll(f, -1, axis)
        wn = jnp.roll(w, -1, axis)
        # last slice along axis has no neighbor
        idx = jnp.arange(resolution)
        shape = [1, 1, 1]
        shape[axis] = resolution
        has_nbr = (idx < resolution - 1).reshape(shape)
        cross = valid & (wn > 0.0) & has_nbr & (f * fn < 0.0)
        frac = f / jnp.where(jnp.abs(f - fn) > 1e-12, f - fn, 1.0)
        masks.append(cross)
        fracs.append(jnp.where(cross, frac, 0.0))
    mask = jnp.stack(masks, -1)
    frac = jnp.stack(fracs, -1)

    # central-difference gradient of tsdf for normals (reference uses
    # GetNormalAt / GetTSDFAt sampling; a grid gradient is equivalent
    # at voxel granularity)
    grads = []
    for axis in range(3):
        fp = jnp.roll(f, -1, axis)
        fm = jnp.roll(f, 1, axis)
        grads.append((fp - fm) * 0.5)
    grad = jnp.stack(grads, -1)
    return mask, frac, grad


@partial(jax.jit, static_argnames=("H", "W", "max_steps"))
def raycast(tsdf, weight, color_vol, K, cam_to_world, voxel_length,
            sdf_trunc, origin, H: int, W: int = None, max_steps: int = 256):
    """Per-pixel marching against the TSDF.

    reference: raycast_tsdf_functor (uniform_tsdfvolume.cu:410-600).
    The march mirrors the reference: ONE nearest-voxel fetch per step
    (the reference reads `voxels_[IndexOf(grid_idx)]`, not a trilinear
    sample — round 4's trilinear-per-step version cost 16 gathers per
    step and 22.7 s per 640x480 frame on a v5e), starting at the
    per-ray volume entry time, step sdf_trunc/2, stop at a +/- sign
    change with linear t* interpolation. Unobserved voxels hold
    tsdf=0, so the strict sign tests skip them exactly as the
    reference does. Trilinear sampling is only used for the hit
    normal. The march is a `while_loop` that exits as soon as every
    ray has hit, left the volume, or crossed a back face.
    """
    if W is None:
        H, W = H
    resolution = tsdf.shape[0]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    uu, vv = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))
    dirs_cam = jnp.stack([(uu - cx) / fx, (vv - cy) / fy,
                          jnp.ones_like(uu)], -1)
    dirs_cam = dirs_cam / jnp.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    Rcw = cam_to_world[:3, :3]
    tcw = cam_to_world[:3, 3]
    dirs = dirs_cam @ Rcw.T  # [H,W,3] world
    o = tcw  # camera center world

    inv_vl = 1.0 / voxel_length
    L = resolution * voxel_length
    rel_o = o - origin                      # camera in volume frame

    # per-ray entry/exit times into the volume box [0, L]^3
    # (reference GetMinTime/GetMaxTime, uniform_tsdfvolume.cu:488-508)
    safe_d = jnp.where(jnp.abs(dirs) > 1e-12, dirs, 1e-12)
    t_a = (0.0 - rel_o) / safe_d
    t_b = (L - rel_o) / safe_d
    t_near = jnp.max(jnp.minimum(t_a, t_b), -1)
    t_far = jnp.min(jnp.maximum(t_a, t_b), -1)
    ray0 = jnp.maximum(t_near, 0.0) + voxel_length
    step = sdf_trunc * 0.5

    def nearest(p_rel):
        gi = jnp.floor(p_rel * inv_vl).astype(jnp.int32)
        inb = jnp.all((gi >= 1) & (gi < resolution - 1), -1)
        gic = jnp.clip(gi, 0, resolution - 1)
        return tsdf[gic[..., 0], gic[..., 1], gic[..., 2]], inb

    f0, inb0 = nearest(rel_o + dirs * ray0[..., None])
    f0 = jnp.where(inb0, f0, 0.0)

    def cond(carry):
        i, stopped, hit, t_star, f = carry
        return (i < max_steps) & jnp.any(~stopped)

    def body(carry):
        i, stopped, hit, t_star, f = carry
        ray_len = ray0 + i.astype(jnp.float32) * step
        p = rel_o + dirs * (ray_len + step)[..., None]
        f_new, inb = nearest(p)
        over = ray_len >= t_far
        cross_dn = (f > 0.0) & (f_new < 0.0)
        cross_up = (f < 0.0) & (f_new > 0.0)
        new_hit = ~stopped & inb & cross_dn
        # record the bracketing ray_len; the sub-step zero is refined
        # with trilinear samples after the march (one-time cost)
        t_star = jnp.where(new_hit, ray_len, t_star)
        hit = hit | new_hit
        # reference: break on a back-face crossing; OOB steps skip the
        # test AND keep the previous value (`continue`)
        stopped = stopped | new_hit | (~stopped & inb & cross_up) | over
        f = jnp.where(inb, f_new, f)
        return i + 1, stopped, hit, t_star, f

    zero = jnp.zeros((H, W), jnp.float32)
    _, _, found, t_lo, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.zeros((H, W), bool),
         jnp.zeros((H, W), bool), zero, f0))

    def sample_trilinear_obs(p):
        """Trilinear TSDF at world points p [...,3] plus an all-
        corners-observed mask: near the frustum boundary the stencil
        mixes unobserved tsdf=0 corners, which drags the interpolated
        zero off the surface (seen as a one-sided ~0.005 bias tail
        that slides frame-to-model ICP in its null space)."""
        g = (p - origin) * inv_vl - 0.5
        g0 = jnp.floor(g)
        r = g - g0
        gi = jnp.clip(g0.astype(jnp.int32), 0, resolution - 2)
        val = jnp.zeros(p.shape[:-1], jnp.float32)
        wmin = jnp.full(p.shape[:-1], jnp.inf, jnp.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    wx = r[..., 0] if dx else 1.0 - r[..., 0]
                    wy = r[..., 1] if dy else 1.0 - r[..., 1]
                    wz = r[..., 2] if dz else 1.0 - r[..., 2]
                    ii = gi[..., 0] + dx
                    jj = gi[..., 1] + dy
                    kk = gi[..., 2] + dz
                    val = val + wx * wy * wz * tsdf[ii, jj, kk]
                    wmin = jnp.minimum(wmin, weight[ii, jj, kk])
        return val, wmin > 0.0

    def sample_trilinear(p):
        return sample_trilinear_obs(p)[0]

    # trilinear sub-step refinement of the crossing: the nearest-voxel
    # march quantizes the surface to ~voxel/2, which biases downstream
    # frame-to-model ICP. The smooth (trilinear) field's zero may sit
    # slightly outside the nearest-value bracket, so three one-time
    # samples cover [t_lo - step, t_lo + step] and the refinement
    # interpolates whichever segment carries the +/- change.
    f_a, ob_a = sample_trilinear_obs(o + dirs * (t_lo - step)[..., None])
    f_b, ob_b = sample_trilinear_obs(o + dirs * t_lo[..., None])
    f_c, ob_c = sample_trilinear_obs(o + dirs * (t_lo + step)[..., None])
    use_ab = (f_a > 0.0) & (f_b <= 0.0)
    seg_t = jnp.where(use_ab, t_lo - step, t_lo)
    flo = jnp.where(use_ab, f_a, f_b)
    fhi = jnp.where(use_ab, f_b, f_c)
    seg_obs = jnp.where(use_ab, ob_a & ob_b, ob_b & ob_c)
    good = (flo > 0.0) & (fhi < 0.0) & (jnp.abs(flo - fhi) > 1e-12)
    t_star = jnp.where(
        good, seg_t + step * flo / jnp.where(good, flo - fhi, 1.0),
        t_lo + 0.5 * step)
    # fully-observed refinement only: unconfirmed or boundary hits are
    # dropped (the round-4 weight-gated sampler's behavior)
    found = found & good & seg_obs
    pts = o + dirs * t_star[..., None]

    eps = voxel_length
    nx = sample_trilinear(pts + jnp.asarray([eps, 0, 0])) \
        - sample_trilinear(pts - jnp.asarray([eps, 0, 0]))
    ny = sample_trilinear(pts + jnp.asarray([0, eps, 0])) \
        - sample_trilinear(pts - jnp.asarray([0, eps, 0]))
    nz = sample_trilinear(pts + jnp.asarray([0, 0, eps])) \
        - sample_trilinear(pts - jnp.asarray([0, 0, eps]))
    n = jnp.stack([nx, ny, nz], -1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    # nearest-voxel color
    g = jnp.clip(((pts - origin) * inv_vl - 0.5).astype(jnp.int32), 0,
                 resolution - 1)
    colors = color_vol[g[..., 0], g[..., 1], g[..., 2]]

    nanv = jnp.nan
    pts = jnp.where(found[..., None], pts, nanv)
    n = jnp.where(found[..., None], n, nanv)
    colors = jnp.where(found[..., None], colors, nanv)
    return pts.reshape(-1, 3), n.reshape(-1, 3), colors.reshape(-1, 3)


@partial(jax.jit, static_argnames=("resolution",))
def mc_classify(tsdf, weight, resolution: int):
    """Cube index + validity per marching-cubes cell.

    reference: the first pass of ExtractTriangleMesh
    (uniform_tsdfvolume.cu:170-230): a cell participates only when all
    8 corners are observed (weight > 0); corner k sets bit k when
    tsdf < 0 (inside).
    """
    f = tsdf
    w = weight
    C = resolution - 1
    idx = jnp.zeros((C, C, C), jnp.int32)
    observed = jnp.ones((C, C, C), bool)
    from .marching_cubes_tables import CORNERS

    for k, (dx, dy, dz) in enumerate(CORNERS):
        fc = f[dx: dx + C, dy: dy + C, dz: dz + C]
        wc = w[dx: dx + C, dy: dy + C, dz: dz + C]
        idx = idx | (jnp.where(fc < 0.0, 1, 0) << k)
        observed = observed & (wc > 0.0)
    return jnp.where(observed, idx, 0)


# ---------------------------------------------------------------------------
# device-side marching-cubes compaction + emit
# (reference does GPU compaction in uniform_tsdfvolume.cu:703-840; here
# classification, active-cell compaction (jnp.nonzero with a static
# size) and vertex emission all run jitted; the host only trims the
# fixed-capacity output)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("side",))
def mc_classify_blocks(fields, weights, side: int):
    """Cube index per cell for batched [B, S, S, S] fields with
    stitched borders (S = side). Returns [B, S-1, S-1, S-1] int32."""
    from .marching_cubes_tables import CORNERS

    C = side - 1
    idx = jnp.zeros(fields.shape[:1] + (C, C, C), jnp.int32)
    observed = jnp.ones(idx.shape, bool)
    for k, (dx, dy, dz) in enumerate(CORNERS):
        fc = fields[:, dx: dx + C, dy: dy + C, dz: dz + C]
        wc = weights[:, dx: dx + C, dy: dy + C, dz: dz + C]
        idx = idx | (jnp.where(fc < 0.0, 1, 0) << k)
        observed = observed & (wc > 0.0)
    return jnp.where(observed, idx, 0)


@partial(jax.jit, static_argnames=("cap",))
def mc_compact(cases_flat, cap: int):
    """Active-cell compaction on device: flat cell ids of cells with a
    non-trivial case, padded to `cap` (fill -1), plus the true count."""
    active = (cases_flat != 0) & (cases_flat != 255)
    count = jnp.sum(active)
    (ids,) = jnp.nonzero(active, size=cap, fill_value=-1)
    return ids, count


@partial(jax.jit, static_argnames=("side", "color_channels"))
def mc_emit_blocks(fields, colors, cases_flat, cell_ids, block_origins,
                   block_keys, voxel_length, side: int,
                   color_channels: int):
    """Vertex emission for compacted cells over [B, S, S, S] fields.

    cell_ids: [cap] flat ids into [B, (S-1)^3] (-1 = padding).
    block_keys: [B, 3] int32 integer block coordinates (global voxel =
    block_key * (S-1 block voxels) + local), used to emit an EXACT
    integer identity per mesh vertex (global edge id) so vertex
    welding — including across block borders — is float-free.
    Returns (verts [cap, 15, 3], cols [cap, 15, 3],
             ekeys [cap, 15, 4] int32 (gx, gy, gz, axis),
             tri_valid [cap, 5]).
    """
    from .marching_cubes_tables import (
        CORNERS, EDGE_VERTS, NUM_TRIS, TRI_TABLE)

    C = side - 1
    ok = cell_ids >= 0
    ids = jnp.maximum(cell_ids, 0)
    b = ids // (C * C * C)
    r = ids % (C * C * C)
    ci = r // (C * C)
    cj = (r // C) % C
    ck = r % C
    cases = cases_flat[ids]

    corner_f = []
    corner_c = []
    for dx, dy, dz in CORNERS:
        corner_f.append(fields[b, ci + dx, cj + dy, ck + dz])
        if color_channels:
            corner_c.append(colors[b, ci + dx, cj + dy, ck + dz])
        else:
            corner_c.append(jnp.zeros(ids.shape + (3,), jnp.float32))
    corner_f = jnp.stack(corner_f, -1)                    # [cap, 8]
    corner_c = jnp.stack(corner_c, 1)                     # [cap, 8, 3]

    ev = jnp.asarray(EDGE_VERTS)
    fa = corner_f[:, ev[:, 0]]                            # [cap, 12]
    fb = corner_f[:, ev[:, 1]]
    denom = jnp.where(jnp.abs(fb - fa) > 1e-12, fb - fa, 1.0)
    t = jnp.clip(-fa / denom, 0.0, 1.0)
    pa = jnp.asarray(CORNERS[EDGE_VERTS[:, 0]], jnp.float32)  # [12, 3]
    pb = jnp.asarray(CORNERS[EDGE_VERTS[:, 1]], jnp.float32)
    cell = jnp.stack([ci, cj, ck], -1).astype(jnp.float32)
    edge_pts = cell[:, None, :] + pa[None] + t[..., None] * (pb - pa)[None]
    edge_pts = (edge_pts + 0.5) * voxel_length \
        + block_origins[b][:, None, :]                    # [cap, 12, 3]
    ca = corner_c[:, ev[:, 0]]
    cb = corner_c[:, ev[:, 1]]
    edge_cols = ca + t[..., None] * (cb - ca)

    # exact integer edge identity: lower corner of the edge in GLOBAL
    # voxel coordinates + the edge axis
    lower = np.minimum(CORNERS[EDGE_VERTS[:, 0]],
                       CORNERS[EDGE_VERTS[:, 1]])         # [12, 3]
    axis = np.argmax(np.abs(CORNERS[EDGE_VERTS[:, 1]]
                            - CORNERS[EDGE_VERTS[:, 0]]), -1)  # [12]
    gcell = block_keys[b] * (side - 1) \
        + jnp.stack([ci, cj, ck], -1)                     # [cap, 3]
    ekeys12 = jnp.concatenate([
        gcell[:, None, :] + jnp.asarray(lower, jnp.int32)[None],
        jnp.broadcast_to(jnp.asarray(axis, jnp.int32)[None, :, None],
                         (ids.shape[0], 12, 1))], -1)     # [cap, 12, 4]

    tri_edges = jnp.asarray(TRI_TABLE)[cases]             # [cap, 16]
    ntris = jnp.asarray(NUM_TRIS)[cases]                  # [cap]
    e = jnp.maximum(tri_edges[:, :15], 0)                 # [cap, 15]
    verts = jnp.take_along_axis(edge_pts, e[..., None], axis=1)
    cols = jnp.take_along_axis(edge_cols, e[..., None], axis=1)
    ekeys = jnp.take_along_axis(ekeys12, e[..., None], axis=1)
    tri_valid = ok[:, None] & (
        jnp.arange(5)[None, :] < ntris[:, None])          # [cap, 5]
    return verts, cols, ekeys, tri_valid
