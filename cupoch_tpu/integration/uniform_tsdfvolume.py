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
from .marching_cubes_tables import (
    CORNERS,
    EDGE_VERTS,
    NUM_TRIS,
    TRI_TABLE,
)
from .tsdfvolume import TSDFVolume, TSDFVolumeColorType


class UniformTSDFVolume(TSDFVolume):
    """reference: uniform_tsdfvolume.h:37-120."""

    def __init__(self, length: float, resolution: int, sdf_trunc: float,
                 color_type: TSDFVolumeColorType = TSDFVolumeColorType.RGB8,
                 origin=(0.0, 0.0, 0.0)):
        super().__init__(length / float(resolution), sdf_trunc, color_type)
        self.length = float(length)
        self.resolution = int(resolution)
        self.origin = np.asarray(origin, np.float32)
        self.reset()

    @property
    def voxel_num(self) -> int:
        return self.resolution ** 3

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
            jnp.asarray(self.origin, jnp.float32),
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
        uniform_tsdfvolume.cu:703-740 + extract_pointcloud_functor)."""
        mask, frac, grad = tsdf_ops.surface_crossings(
            self.tsdf, self.weight, jnp.float32(self.voxel_length),
            jnp.asarray(self.origin), self.resolution)
        m = np.asarray(mask)
        fr = np.asarray(frac)
        gr = np.asarray(grad)
        ii, jj, kk, aa = np.nonzero(m)
        if len(ii) == 0:
            return PointCloud()
        base = (np.stack([ii, jj, kk], -1).astype(np.float32) + 0.5) \
            * self.voxel_length + self.origin
        offs = np.zeros((len(ii), 3), np.float32)
        offs[np.arange(len(ii)), aa] = fr[ii, jj, kk, aa] * self.voxel_length
        pts = base + offs
        pcd = PointCloud(pts)
        n = gr[ii, jj, kk]
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        pcd.normals = n / np.maximum(norm, 1e-12)
        if self.color_type != TSDFVolumeColorType.NoColor:
            c = np.asarray(self.color)[ii, jj, kk]
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
            * self.voxel_length + self.origin
        pcd = PointCloud(pts)
        c = (f[sel] + 1.0) * 0.5
        pcd.colors = np.stack([c, c, c], -1)
        return pcd

    def extract_triangle_mesh(self) -> TriangleMesh:
        """Marching cubes (reference: ExtractTriangleMesh,
        uniform_tsdfvolume.cu:740-840; tables self-derived, see
        marching_cubes_tables.py)."""
        cube_idx = np.asarray(tsdf_ops.mc_classify(
            self.tsdf, self.weight, self.resolution))
        active = np.nonzero((cube_idx != 0) & (cube_idx != 255))
        if len(active[0]) == 0:
            return TriangleMesh()
        cases = cube_idx[active]
        cells = np.stack(active, -1).astype(np.int32)  # [A,3]

        f = np.asarray(self.tsdf)
        col = np.asarray(self.color)
        corner_f = np.stack([
            f[cells[:, 0] + dx, cells[:, 1] + dy, cells[:, 2] + dz]
            for dx, dy, dz in CORNERS], -1)  # [A,8]
        corner_c = np.stack([
            col[cells[:, 0] + dx, cells[:, 1] + dy, cells[:, 2] + dz]
            for dx, dy, dz in CORNERS], 1)  # [A,8,3]

        # interpolated vertex on each of the 12 edges
        ev = EDGE_VERTS
        fa = corner_f[:, ev[:, 0]]  # [A,12]
        fb = corner_f[:, ev[:, 1]]
        denom = np.where(np.abs(fb - fa) > 1e-12, fb - fa, 1.0)
        t = np.clip(-fa / denom, 0.0, 1.0)  # zero of fa + t*(fb-fa)
        pa = CORNERS[ev[:, 0]].astype(np.float32)  # [12,3]
        pb = CORNERS[ev[:, 1]].astype(np.float32)
        edge_pts = (cells[:, None, :] + pa[None] +
                    t[..., None] * (pb - pa)[None])  # [A,12,3]
        edge_pts = (edge_pts + 0.5) * self.voxel_length + self.origin
        ca = corner_c[:, ev[:, 0]]
        cb = corner_c[:, ev[:, 1]]
        edge_cols = ca + t[..., None] * (cb - ca)

        tri_edges = TRI_TABLE[cases]  # [A,16]
        ntris = NUM_TRIS[cases]  # [A]
        verts = []
        colors = []
        max_t = int(ntris.max())
        for ti in range(max_t):
            sel = ntris > ti
            e = tri_edges[sel, 3 * ti: 3 * ti + 3]  # [S,3]
            rows = np.nonzero(sel)[0]
            v3 = edge_pts[rows[:, None], e]  # [S,3,3]
            c3 = edge_cols[rows[:, None], e]
            verts.append(v3.reshape(-1, 3))
            colors.append(c3.reshape(-1, 3))
        v = np.concatenate(verts, 0).astype(np.float32)
        c = np.concatenate(colors, 0).astype(np.float32)
        mesh = TriangleMesh(
            v, np.arange(len(v), dtype=np.int32).reshape(-1, 3))
        if self.color_type == TSDFVolumeColorType.RGB8:
            mesh.vertex_colors = c / 255.0
        elif self.color_type == TSDFVolumeColorType.Gray32:
            mesh.vertex_colors = c
        mesh.remove_duplicated_vertices()
        mesh.compute_vertex_normals()
        return mesh

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
            jnp.float32(sdf_trunc), jnp.asarray(self.origin),
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
