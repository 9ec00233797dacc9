"""Scalable (block-hashed) TSDF volume.

reference: src/cupoch/integration/scalable_tsdfvolume.h/.cu — a
stdgpu::unordered_map<Vector3i, VolumeUnit> of 16^3 voxel blocks,
allocated on demand near observed depth (OpenVolumeUnitKernel,
scalable_tsdfvolume.cu:98,305-346).

TPU design: the hash map becomes a host-side dict (block key -> slot)
plus fixed-capacity device arrays [B, 16,16,16] for tsdf/weight/color.
Block allocation is data-dependent and tiny (O(active blocks) per
frame, host work); the heavy per-voxel update runs as ONE jitted
kernel over all active blocks — the same integrate math as the
uniform volume, batched over a block axis.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import image_ops
from ..geometry.image import RGBDImage
from ..geometry.pointcloud import PointCloud
from .tsdfvolume import TSDFVolume, TSDFVolumeColorType

BLOCK = 16  # voxels per block side (reference: VolumeUnit 16^3)


from functools import partial


@partial(jax.jit, static_argnames=("color_channels",))
def _integrate_blocks(tsdf, weight, color_vol, block_origins, depth,
                      color_img, mult, K, extrinsic, voxel_length,
                      sdf_trunc, color_channels: int):
    """Projective update over [B,16,16,16] blocks (same math as
    integrate_functor.h:85-140, with per-block origins)."""
    H, W = depth.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    r = jnp.arange(BLOCK, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(r, r, r, indexing="ij")
    local = jnp.stack([gx, gy, gz], -1) * voxel_length + 0.5 * voxel_length
    pts = block_origins[:, None, None, None, :] + local[None]  # [B,16,16,16,3]
    R_ = extrinsic[:3, :3]
    t_ = extrinsic[:3, 3]
    pc = pts @ R_.T + t_
    z = pc[..., 2]
    safe_z = jnp.where(z > 1e-8, z, 1.0)
    u_f = pc[..., 0] * fx / safe_z + cx + 0.5
    v_f = pc[..., 1] * fy / safe_z + cy + 0.5
    in_img = ((u_f >= 1e-4) & (u_f < W - 1e-4) &
              (v_f >= 1e-4) & (v_f < H - 1e-4) & (z > 0))
    u = jnp.clip(u_f.astype(jnp.int32), 0, W - 1)
    v = jnp.clip(v_f.astype(jnp.int32), 0, H - 1)
    d = depth[v, u]
    sdf = (d - z) * mult[v, u]
    update = in_img & (d > 0.0) & (sdf > -sdf_trunc)
    tsdf_new = jnp.minimum(1.0, sdf / sdf_trunc)
    w = weight
    w1 = w + 1.0
    tsdf_out = jnp.where(update, (tsdf * w + tsdf_new) / w1, tsdf)
    weight_out = jnp.where(update, w1, w)
    if color_channels > 0:
        cimg = color_img[v, u]
        c_out = jnp.where(update[..., None],
                          (color_vol * w[..., None] + cimg) / w1[..., None],
                          color_vol)
    else:
        c_out = color_vol
    return tsdf_out, weight_out, c_out


class ScalableTSDFVolume(TSDFVolume):
    """reference: scalable_tsdfvolume.h:44-112."""

    def __init__(self, voxel_length: float, sdf_trunc: float,
                 color_type: TSDFVolumeColorType = TSDFVolumeColorType.RGB8,
                 volume_unit_resolution: int = BLOCK,
                 depth_sampling_stride: int = 4,
                 initial_capacity: int = 1024):
        super().__init__(voxel_length, sdf_trunc, color_type)
        if volume_unit_resolution != BLOCK:
            raise ValueError("volume_unit_resolution must be 16")
        self.volume_unit_resolution = BLOCK
        self.volume_unit_length = voxel_length * BLOCK
        self.depth_sampling_stride = int(depth_sampling_stride)
        self._capacity = int(initial_capacity)
        self.reset()

    def reset(self):
        B = self._capacity
        self._slots: Dict[Tuple[int, int, int], int] = {}
        self.tsdf = jnp.zeros((B, BLOCK, BLOCK, BLOCK), jnp.float32)
        self.weight = jnp.zeros((B, BLOCK, BLOCK, BLOCK), jnp.float32)
        self.color = jnp.zeros((B, BLOCK, BLOCK, BLOCK, 3), jnp.float32)
        return self

    def __len__(self):
        return len(self._slots)

    def _grow(self, needed: int):
        while self._capacity < needed:
            self._capacity *= 2
        B = self._capacity

        def pad(x):
            extra = B - x.shape[0]
            if extra <= 0:
                return x
            return jnp.concatenate(
                [x, jnp.zeros((extra,) + x.shape[1:], x.dtype)], 0)

        self.tsdf = pad(self.tsdf)
        self.weight = pad(self.weight)
        self.color = pad(self.color)

    def _touched_blocks(self, depth_np, K, extrinsic) -> np.ndarray:
        """Blocks near observed depth (reference: OpenVolumeUnitKernel,
        scalable_tsdfvolume.cu:98 — each sampled depth point opens the
        blocks within sdf_trunc of the point along the ray)."""
        H, W = depth_np.shape
        s = self.depth_sampling_stride
        d = depth_np[::s, ::s]
        vv, uu = np.meshgrid(np.arange(0, H, s), np.arange(0, W, s),
                             indexing="ij")
        ok = d > 0
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        keys = set()
        T_inv = np.linalg.inv(extrinsic)
        zs = d[ok]
        us = uu[ok]
        vs = vv[ok]
        rays = np.stack([(us - cx) / fx, (vs - cy) / fy, np.ones_like(zs)], -1)
        norm = np.linalg.norm(rays, axis=-1)
        for tscale in (-self.sdf_trunc, 0.0, self.sdf_trunc):
            pts_cam = rays * (zs + tscale / np.maximum(norm, 1e-9))[:, None]
            pts_w = pts_cam @ T_inv[:3, :3].T + T_inv[:3, 3]
            bk = np.floor(pts_w / self.volume_unit_length).astype(np.int64)
            keys.update(map(tuple, np.unique(bk, axis=0)))
        return np.asarray(sorted(keys), np.int64).reshape(-1, 3)

    def integrate(self, image: RGBDImage, intrinsic, extrinsic=None):
        """reference: ScalableTSDFVolume::Integrate
        (scalable_tsdfvolume.cu:380-420)."""
        extrinsic = (np.eye(4, dtype=np.float32) if extrinsic is None
                     else np.asarray(extrinsic, np.float32))
        depth = image.depth.data.astype(jnp.float32)
        depth = depth[..., 0] if depth.ndim == 3 else depth
        depth_np = np.asarray(depth)
        K = np.asarray(intrinsic.intrinsic_matrix, np.float32)

        new_keys = self._touched_blocks(depth_np, K, extrinsic)
        for k in map(tuple, new_keys):
            if k not in self._slots:
                self._slots[k] = len(self._slots)
        if len(self._slots) > self._capacity:
            self._grow(len(self._slots))

        # frustum culling: integrate only blocks visible in THIS frame
        # (reference allocates/updates near observed depth only,
        # scalable_tsdfvolume.cu:98,305-346; round-1 updated the whole
        # map every frame — O(map) per frame on long trajectories)
        keys = np.asarray(list(self._slots.keys()), np.float32)
        slots = np.asarray(list(self._slots.values()), np.int64)
        H, W = depth_np.shape
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        centers = (keys + 0.5) * self.volume_unit_length
        pc = centers @ extrinsic[:3, :3].T + extrinsic[:3, 3]
        # block bounding-sphere radius + truncation slack
        rad = (np.sqrt(3.0) / 2.0) * self.volume_unit_length \
            + self.sdf_trunc
        z = pc[:, 2]
        zmax = float(depth_np.max()) if depth_np.size else 0.0
        vis = (z > -rad) & (z - rad < zmax + self.sdf_trunc)
        safe_z = np.maximum(z, 1e-6)
        u = pc[:, 0] * fx / safe_z + cx
        v = pc[:, 1] * fy / safe_z + cy
        # pixel-space slack from the bounding sphere
        su = rad * fx / safe_z
        sv = rad * fy / safe_z
        vis &= (u + su >= 0) & (u - su < W) & (v + sv >= 0) & (v - sv < H)
        if not vis.any():
            return self
        keys = keys[vis]
        slots = slots[vis]
        # bucket the visible count so recompiles stay rare; pad rows
        # scatter back with mode="drop"
        n_vis = len(slots)
        n_pad = 8
        while n_pad < n_vis:
            n_pad *= 2
        pad = n_pad - n_vis
        if pad:
            far = np.full((pad, 3), 1e6, np.float32)
            keys = np.concatenate([keys, far], 0)
            slots = np.concatenate(
                [slots, np.full(pad, self.tsdf.shape[0], np.int64)], 0)
        origins = keys * self.volume_unit_length

        mult = image_ops.depth_to_camera_distance_multiplier(
            depth_np.shape[1], depth_np.shape[0], K)[..., 0]
        if self.color_type == TSDFVolumeColorType.NoColor:
            cimg = jnp.zeros(depth.shape + (3,), jnp.float32)
            channels = 0
        else:
            cimg = image.color.data.astype(jnp.float32)
            if cimg.shape[-1] == 1:
                cimg = jnp.broadcast_to(cimg, cimg.shape[:-1] + (3,))
            channels = 3

        sl = jnp.asarray(slots)
        t_new, w_new, c_new = _integrate_blocks(
            self.tsdf[sl], self.weight[sl], self.color[sl],
            jnp.asarray(origins), depth, cimg, mult,
            jnp.asarray(K), jnp.asarray(extrinsic),
            jnp.float32(self.voxel_length), jnp.float32(self.sdf_trunc),
            channels)
        self.tsdf = self.tsdf.at[sl].set(t_new, mode="drop")
        self.weight = self.weight.at[sl].set(w_new, mode="drop")
        self.color = self.color.at[sl].set(c_new, mode="drop")
        return self

    def _stitched_fields(self, with_color: bool):
        """Vectorized [B, 17, 17, 17] fields with the +x/+y/+z faces,
        the three +diagonal edges and the +x+y+z corner stitched from
        the 7 forward neighbor blocks (missing neighbors read a zero
        block, i.e. weight 0 = unobserved). Device gathers throughout;
        the host only resolves neighbor slots from the block table."""
        keys = list(self._slots.keys())
        slots = np.asarray([self._slots[k] for k in keys], np.int64)
        B = len(keys)
        zero_slot = self.tsdf.shape[0]  # one-past-end = zero block

        def nbr(dx, dy, dz):
            return np.asarray(
                [self._slots.get((k[0] + dx, k[1] + dy, k[2] + dz),
                                 zero_slot) for k in keys], np.int64)

        f = jnp.concatenate(
            [self.tsdf, jnp.zeros((1, BLOCK, BLOCK, BLOCK),
                                  jnp.float32)], 0)
        w = jnp.concatenate(
            [self.weight, jnp.zeros((1, BLOCK, BLOCK, BLOCK),
                                    jnp.float32)], 0)
        c = jnp.concatenate(
            [self.color, jnp.zeros((1, BLOCK, BLOCK, BLOCK, 3),
                                   jnp.float32)], 0) if with_color \
            else None

        S = BLOCK + 1
        n100 = nbr(1, 0, 0)
        n010 = nbr(0, 1, 0)
        n001 = nbr(0, 0, 1)
        n110 = nbr(1, 1, 0)
        n101 = nbr(1, 0, 1)
        n011 = nbr(0, 1, 1)
        n111 = nbr(1, 1, 1)

        def stitch(src):
            out = jnp.zeros((B, S, S, S) + src.shape[4:], src.dtype)
            out = out.at[:, :BLOCK, :BLOCK, :BLOCK].set(src[slots])
            out = out.at[:, BLOCK, :BLOCK, :BLOCK].set(src[n100][:, 0])
            out = out.at[:, :BLOCK, BLOCK, :BLOCK].set(src[n010][:, :, 0])
            out = out.at[:, :BLOCK, :BLOCK, BLOCK].set(
                src[n001][:, :, :, 0])
            out = out.at[:, BLOCK, BLOCK, :BLOCK].set(src[n110][:, 0, 0])
            out = out.at[:, BLOCK, :BLOCK, BLOCK].set(
                src[n101][:, 0, :, 0])
            out = out.at[:, :BLOCK, BLOCK, BLOCK].set(
                src[n011][:, :, 0, 0])
            out = out.at[:, BLOCK, BLOCK, BLOCK].set(
                src[n111][:, 0, 0, 0])
            return out

        fp = stitch(f)
        wp = stitch(w)
        cp = stitch(c) if with_color else None
        return fp, wp, cp, np.asarray(keys, np.int64), slots

    def extract_point_cloud(self) -> PointCloud:
        """Zero-crossing extraction per block with stitched neighbor
        borders (reference: ScalableTSDFVolume::ExtractPointCloud)."""
        if not self._slots:
            return PointCloud()
        fp_j, wp_j, _, keys_arr, slots = self._stitched_fields(False)
        fp = np.asarray(fp_j)
        wp = np.asarray(wp_j)
        keys = [tuple(k) for k in keys_arr]
        c = np.asarray(self.color)
        B = len(keys)

        pts_all = []
        cols_all = []
        valid0 = (wp[:, :BLOCK, :BLOCK, :BLOCK] > 0) & (
            np.abs(fp[:, :BLOCK, :BLOCK, :BLOCK]) < 0.98)
        f0 = fp[:, :BLOCK, :BLOCK, :BLOCK]
        origins = np.asarray(keys, np.float32) * self.volume_unit_length
        for axis in range(3):
            sl = [slice(0, BLOCK)] * 3
            sl[axis] = slice(1, BLOCK + 1)
            fn = fp[(slice(None),) + tuple(sl)]
            wn = wp[(slice(None),) + tuple(sl)]
            cross = valid0 & (wn > 0) & (f0 * fn < 0)
            bi, ii, jj, kk = np.nonzero(cross)
            if len(bi) == 0:
                continue
            fa = f0[bi, ii, jj, kk]
            fb = fn[bi, ii, jj, kk]
            t = fa / (fa - fb)
            base = (np.stack([ii, jj, kk], -1) + 0.5) * self.voxel_length
            off = np.zeros((len(bi), 3), np.float32)
            off[:, axis] = t * self.voxel_length
            pts_all.append(origins[bi] + base + off)
            cols_all.append(c[np.asarray(slots)[bi], ii, jj, kk])
        if not pts_all:
            return PointCloud()
        pcd = PointCloud(np.concatenate(pts_all, 0))
        if self.color_type != TSDFVolumeColorType.NoColor:
            cols = np.concatenate(cols_all, 0)
            if self.color_type == TSDFVolumeColorType.RGB8:
                cols = cols / 255.0
            pcd.colors = cols
        return pcd

    def extract_triangle_mesh(self):
        """Block-local marching cubes over stitched [B, 17, 17, 17]
        fields — O(active blocks) memory and compute, no dense
        re-assembly (reference: per-block MC with neighbor borders,
        scalable_tsdfvolume.cu ExtractTriangleMesh). Cross-block vertex
        welding is exact: the device emit labels every vertex with its
        integer global edge id."""
        from .uniform_tsdfvolume import mesh_from_mc_device

        if not self._slots:
            from ..geometry.trianglemesh import TriangleMesh

            return TriangleMesh()
        with_color = self.color_type != TSDFVolumeColorType.NoColor
        fp, wp, cp, keys, _ = self._stitched_fields(with_color)
        if cp is None:
            cp = jnp.zeros(fp.shape + (3,), jnp.float32)
        origins = keys.astype(np.float32) * self.volume_unit_length
        return mesh_from_mc_device(
            fp, wp, cp, origins, keys.astype(np.int32),
            self.voxel_length, BLOCK + 1, self.color_type)
