"""Dense uniform TSDF volume.

reference: src/cupoch/integration/uniform_tsdfvolume.h/.cu (953 LoC).
State is three dense jax Arrays (tsdf [R,R,R], weight [R,R,R],
color [R,R,R,3]) updated functionally by the kernels in `tsdf_ops`;
extraction uses two-pass host compaction (classify on device, gather
active cells, emit fixed-capacity vertex soup).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.image import RGBDImage
from ..geometry.pointcloud import PointCloud
from ..geometry.trianglemesh import TriangleMesh
from ..geometry import image_ops
from ..utility import console
from . import tsdf_ops
from .tsdfvolume import TSDFVolume, TSDFVolumeColorType


def _next_bucket(n: int, lo: int = 1024) -> int:
    c = lo
    while c < n:
        c *= 2
    return c


def mesh_from_mc_device(fields, weights, colors, block_origins,
                        block_keys, voxel_length, side: int,
                        color_type) -> "TriangleMesh":
    """Shared device-side marching-cubes driver over [B, S, S, S]
    fields (B=1 dense volume, or stitched 17^3 blocks for the scalable
    volume). Only a count scalar and the final weld touch the host;
    vertices are welded by their exact integer edge identity (emitted
    by the kernel), so watertightness is independent of float rounding
    and holds across block borders."""
    cases = tsdf_ops.mc_classify_blocks(fields, weights, side)
    cases_flat = cases.reshape(-1)
    count = int(jnp.sum((cases_flat != 0) & (cases_flat != 255)))
    if count == 0:
        return TriangleMesh()
    cap = _next_bucket(count)
    ids, _ = tsdf_ops.mc_compact(cases_flat, cap)
    channels = 0 if color_type == TSDFVolumeColorType.NoColor else 3
    verts, cols, ekeys, tri_valid = tsdf_ops.mc_emit_blocks(
        fields, colors, cases_flat, ids,
        jnp.asarray(block_origins, jnp.float32),
        jnp.asarray(block_keys, jnp.int32),
        jnp.float32(voxel_length), side, channels)
    tv = np.asarray(tri_valid)                      # [cap, 5]
    v = np.asarray(verts).reshape(cap, 5, 3, 3)[tv].reshape(-1, 3)
    c = np.asarray(cols).reshape(cap, 5, 3, 3)[tv].reshape(-1, 3)
    k = np.asarray(ekeys).reshape(cap, 5, 3, 4)[tv].reshape(-1, 4)
    uniq, first, inv = np.unique(k, axis=0, return_index=True,
                                 return_inverse=True)
    mesh = TriangleMesh(
        v[first].astype(np.float32),
        inv.reshape(-1, 3).astype(np.int32))
    cw = c[first]
    if color_type == TSDFVolumeColorType.RGB8:
        mesh.vertex_colors = cw / 255.0
    elif color_type == TSDFVolumeColorType.Gray32:
        mesh.vertex_colors = cw
    mesh.remove_degenerate_triangles() if hasattr(
        mesh, "remove_degenerate_triangles") else None
    mesh.compute_vertex_normals()
    return mesh


class UniformTSDFVolume(TSDFVolume):
    """reference: uniform_tsdfvolume.h:37-120."""

    def __init__(self, length: float, resolution: int, sdf_trunc: float,
                 color_type: TSDFVolumeColorType = TSDFVolumeColorType.RGB8,
                 origin=(0.0, 0.0, 0.0)):
        super().__init__(length / float(resolution), sdf_trunc, color_type)
        self.length = float(length)
        self.resolution = int(resolution)
        # reference parity: cupoch's uniform volume is CENTERED on
        # `origin` — every functor offsets indices by resolution/2
        # (integrate_functor.h:188-189, uniform_tsdfvolume.cu:120-155
        # "point - h_res", raycast grid_idx "+ h_res"). Kernels here
        # take the MIN-CORNER, so translate once at the boundary.
        self.origin = np.asarray(origin, np.float32)
        self.reset()

    @property
    def voxel_num(self) -> int:
        return self.resolution ** 3

    @property
    def corner(self) -> np.ndarray:
        """Min-corner of the (centered) volume in world frame."""
        return (self.origin - 0.5 * self.length).astype(np.float32)

    def reset(self):
        R = self.resolution
        self.tsdf = jnp.zeros((R, R, R), jnp.float32)
        self.weight = jnp.zeros((R, R, R), jnp.float32)
        self.color = jnp.zeros((R, R, R, 3), jnp.float32)
        return self

    # -- integration ----------------------------------------------------
    def integrate(self, image: RGBDImage, intrinsic, extrinsic=None):
        """reference: UniformTSDFVolume::Integrate
        (uniform_tsdfvolume.cu:670-700)."""
        extrinsic = (np.eye(4, dtype=np.float32) if extrinsic is None
                     else np.asarray(extrinsic, np.float32))
        depth = image.depth.data.astype(jnp.float32)
        depth = depth[..., 0] if depth.ndim == 3 else depth
        mult = image_ops.depth_to_camera_distance_multiplier(
            depth.shape[1], depth.shape[0], intrinsic.intrinsic_matrix)[..., 0]
        if self.color_type == TSDFVolumeColorType.NoColor:
            cimg = jnp.zeros(depth.shape + (3,), jnp.float32)
            channels = 0
        else:
            cimg = image.color.data.astype(jnp.float32)
            if cimg.shape[-1] == 1:
                cimg = jnp.broadcast_to(cimg, cimg.shape[:-1] + (3,))
            channels = 3
        self.tsdf, self.weight, self.color = tsdf_ops.integrate(
            self.tsdf, self.weight, self.color, depth, cimg, mult,
            jnp.asarray(intrinsic.intrinsic_matrix, jnp.float32),
            jnp.asarray(extrinsic, jnp.float32),
            jnp.float32(self.voxel_length), jnp.float32(self.sdf_trunc),
            jnp.asarray(self.corner, jnp.float32),
            self.resolution, channels)
        return self

    def integrate_with_depth_to_camera_distance_multiplier(
            self, image, intrinsic, extrinsic, multiplier):
        """reference: uniform_tsdfvolume.cu:897-922."""
        return self.integrate(image, intrinsic, extrinsic)

    # -- extraction ------------------------------------------------------
    def extract_point_cloud(self) -> PointCloud:
        """Zero-crossing surface points (reference:
        UniformTSDFVolume::ExtractPointCloud,
        uniform_tsdfvolume.cu:703-740 + extract_pointcloud_functor).

        Compaction runs on device (count -> nonzero with a static
        size -> gather); the host only sizes the capacity bucket and
        trims the padded output."""
        mask, frac, grad = tsdf_ops.surface_crossings(
            self.tsdf, self.weight, jnp.float32(self.voxel_length),
            jnp.asarray(self.corner), self.resolution)
        flat = mask.reshape(-1)
        count = int(jnp.sum(flat))
        if count == 0:
            return PointCloud()
        cap = _next_bucket(count)
        (ids,) = jnp.nonzero(flat, size=cap, fill_value=0)
        C3 = mask.shape[0]
        aa = ids % 3
        lin = ids // 3
        kk = lin % C3
        jj = (lin // C3) % C3
        ii = lin // (C3 * C3)
        base = (jnp.stack([ii, jj, kk], -1).astype(jnp.float32) + 0.5) \
            * self.voxel_length + jnp.asarray(self.corner)
        fr = frac.reshape(-1)[ids] * self.voxel_length
        offs = jnp.where(jnp.arange(3)[None, :] == aa[:, None],
                         fr[:, None], 0.0)
        pts = base + offs
        n = grad.reshape(-1, 3)[lin]
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                            1e-12)
        pcd = PointCloud(np.asarray(pts)[:count])
        pcd.normals = np.asarray(n)[:count]
        if self.color_type != TSDFVolumeColorType.NoColor:
            R = self.resolution  # color grid is [R,R,R,3], cells C3^3
            cidx = (ii * R + jj) * R + kk
            c = np.asarray(self.color.reshape(-1, 3)[cidx])[:count]
            if self.color_type == TSDFVolumeColorType.RGB8:
                c = c / 255.0
            pcd.colors = c
        return pcd

    def extract_voxel_point_cloud(self) -> PointCloud:
        """Voxel centers colored by tsdf (reference:
        ExtractVoxelPointCloud, uniform_tsdfvolume.cu:370-395)."""
        f = np.asarray(self.tsdf)
        w = np.asarray(self.weight)
        sel = (w != 0.0) & (f < 0.98) & (f >= -0.98)
        ii, jj, kk = np.nonzero(sel)
        pts = (np.stack([ii, jj, kk], -1).astype(np.float32) + 0.5) \
            * self.voxel_length + self.corner
        pcd = PointCloud(pts)
        c = (f[sel] + 1.0) * 0.5
        pcd.colors = np.stack([c, c, c], -1)
        return pcd

    def extract_triangle_mesh(self) -> TriangleMesh:
        """Marching cubes (reference: ExtractTriangleMesh,
        uniform_tsdfvolume.cu:740-840; tables self-derived, see
        marching_cubes_tables.py).

        Classification, active-cell compaction and vertex emission all
        run on device at a fixed capacity (count -> nonzero(size) ->
        gather/emit); the host transfers one count scalar to size the
        capacity bucket and trims the padded output."""
        return mesh_from_mc_device(
            self.tsdf[None], self.weight[None], self.color[None],
            np.asarray([self.corner], np.float32),
            np.zeros((1, 3), np.int32), self.voxel_length,
            self.resolution, self.color_type)

    def raycast(self, intrinsic, extrinsic, sdf_trunc: Optional[float] = None,
                project_valid_depth_only: bool = True) -> PointCloud:
        """Render a model view (reference: UniformTSDFVolume::Raycast,
        uniform_tsdfvolume.cu:924-950)."""
        sdf_trunc = self.sdf_trunc if sdf_trunc is None else float(sdf_trunc)
        T = np.asarray(extrinsic, np.float32)
        cam_to_world = np.linalg.inv(T).astype(np.float32)
        diag = self.length * np.sqrt(3.0)
        max_steps = int(np.ceil(diag / (0.5 * sdf_trunc))) + 1
        pts, normals, colors = tsdf_ops.raycast(
            self.tsdf, self.weight, self.color,
            jnp.asarray(intrinsic.intrinsic_matrix, jnp.float32),
            jnp.asarray(cam_to_world), jnp.float32(self.voxel_length),
            jnp.float32(sdf_trunc), jnp.asarray(self.corner),
            H=intrinsic.height, W=intrinsic.width, max_steps=max_steps)
        pts = np.asarray(pts)
        normals = np.asarray(normals)
        colors = np.asarray(colors)
        if project_valid_depth_only:
            ok = np.isfinite(pts).all(-1)
            pts, normals, colors = pts[ok], normals[ok], colors[ok]
        pcd = PointCloud(pts)
        pcd.normals = normals
        if self.color_type == TSDFVolumeColorType.RGB8:
            colors = colors / 255.0
        pcd.colors = colors
        return pcd
