"""Sparse VoxelGrid container.

reference: src/cupoch/geometry/voxelgrid.{h,cu} (voxelgrid.h:84-215) and
voxelgrid_factory.cu. The reference stores parallel device vectors
``voxels_keys_`` / ``voxels_values_`` built with sort_by_key +
reduce_by_key; here creation runs the per-point math as one jit kernel
and the key dedup/color averaging as a segment mean over the sorted
linear keys — same contract: unique [N,3] int keys + averaged colors.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utility import console
from .boundingvolume import AxisAlignedBoundingBox, OrientedBoundingBox
from .geometry import Geometry3D, GeometryType, asarray_f32
from .intersection_test import triangle_aabb

INVALID_VOXEL_INDEX = np.iinfo(np.int32).min


class Voxel:
    """reference: voxelgrid.h:48-63."""

    def __init__(self, grid_index=(0, 0, 0), color=(1.0, 1.0, 1.0)):
        self.grid_index = np.asarray(grid_index, np.int32)
        self.color = np.asarray(color, np.float32)

    def __repr__(self):
        return f"Voxel(grid_index={tuple(self.grid_index)}, color={tuple(self.color)})"


class VoxelGrid(Geometry3D):
    """Sparse voxel list: ``voxels_keys`` [N,3] int32 (unique grid
    indices) + ``voxels_colors`` [N,3] float32."""

    def __init__(self):
        super().__init__(GeometryType.VoxelGrid)
        self.voxel_size = 0.0
        self.origin = np.zeros(3, np.float32)
        self.voxels_keys = jnp.zeros((0, 3), jnp.int32)
        self.voxels_colors = jnp.zeros((0, 3), jnp.float32)

    # -- basics ---------------------------------------------------------
    def __len__(self):
        return int(self.voxels_keys.shape[0])

    def __repr__(self):
        return f"VoxelGrid with {len(self)} voxels."

    def has_voxels(self) -> bool:
        return len(self) > 0

    def has_colors(self) -> bool:
        return True  # reference: voxelgrid.h:113-115 (default white)

    def is_empty(self) -> bool:
        return not self.has_voxels()

    def clear(self):
        self.voxels_keys = jnp.zeros((0, 3), jnp.int32)
        self.voxels_colors = jnp.zeros((0, 3), jnp.float32)
        return self

    def _primary_points(self):
        return self.get_voxel_centers()

    def get_voxel_centers(self) -> jax.Array:
        return (jnp.asarray(self.origin, jnp.float32)
                + (self.voxels_keys.astype(jnp.float32) + 0.5) * self.voxel_size)

    def get_min_bound(self) -> np.ndarray:
        if self.is_empty():
            return np.asarray(self.origin, np.float32)
        return np.asarray(
            self.origin + np.asarray(
                jnp.min(self.voxels_keys, 0), np.float32) * self.voxel_size)

    def get_max_bound(self) -> np.ndarray:
        if self.is_empty():
            return np.asarray(self.origin, np.float32)
        return np.asarray(
            self.origin + (np.asarray(jnp.max(self.voxels_keys, 0), np.float32)
                           + 1.0) * self.voxel_size)

    def get_center(self) -> np.ndarray:
        if self.is_empty():
            return np.zeros(3, np.float32)
        return np.asarray(jnp.mean(self.get_voxel_centers(), 0))

    def get_axis_aligned_bounding_box(self) -> AxisAlignedBoundingBox:
        return AxisAlignedBoundingBox(self.get_min_bound(), self.get_max_bound())

    def get_oriented_bounding_box(self) -> OrientedBoundingBox:
        return OrientedBoundingBox.create_from_points(self.get_voxel_centers())

    # -- voxel access (voxelgrid.h:120-138) -------------------------------
    def get_voxel(self, point) -> np.ndarray:
        p = np.asarray(point, np.float32)
        return np.floor((p - self.origin) / self.voxel_size).astype(np.int32)

    def get_voxel_center_coordinate(self, idx) -> np.ndarray:
        idx = np.asarray(idx, np.float32)
        return self.origin + (idx + 0.5) * self.voxel_size

    def get_voxel_bounding_points(self, index) -> np.ndarray:
        c = self.get_voxel_center_coordinate(index)
        h = self.voxel_size / 2.0
        offs = np.array([[sx, sy, sz] for sx in (-h, h)
                         for sy in (-h, h) for sz in (-h, h)], np.float32)
        return c + offs

    def get_voxels(self):
        keys = np.asarray(self.voxels_keys)
        cols = np.asarray(self.voxels_colors)
        return [Voxel(k, c) for k, c in zip(keys, cols)]

    # -- modification ----------------------------------------------------
    def paint_uniform_color(self, color):
        self.voxels_colors = jnp.broadcast_to(
            jnp.asarray(color, jnp.float32), (len(self), 3))
        return self

    def paint_indexed_color(self, indices, color):
        idx = jnp.asarray(indices, jnp.int32)
        self.voxels_colors = self.voxels_colors.at[idx].set(
            jnp.asarray(color, jnp.float32))
        return self

    def select_by_index(self, indices, invert: bool = False) -> "VoxelGrid":
        """reference: voxelgrid.h SelectByIndex."""
        mask = np.zeros(len(self), bool)
        mask[np.asarray(indices, np.int64)] = True
        if invert:
            mask = ~mask
        out = VoxelGrid()
        out.voxel_size = self.voxel_size
        out.origin = self.origin.copy()
        out.voxels_keys = jnp.asarray(np.asarray(self.voxels_keys)[mask])
        out.voxels_colors = jnp.asarray(np.asarray(self.voxels_colors)[mask])
        return out

    def add_voxel(self, voxel: Voxel):
        self.voxels_keys = jnp.concatenate(
            [self.voxels_keys, jnp.asarray(voxel.grid_index, jnp.int32)[None]], 0)
        self.voxels_colors = jnp.concatenate(
            [self.voxels_colors, jnp.asarray(voxel.color, jnp.float32)[None]], 0)
        self._dedup()
        return self

    def _dedup(self):
        keys = np.asarray(self.voxels_keys)
        cols = np.asarray(self.voxels_colors)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        csum = np.zeros((len(uniq), 3), np.float64)
        np.add.at(csum, inv, cols)
        cnt = np.bincount(inv, minlength=len(uniq))[:, None]
        self.voxels_keys = jnp.asarray(uniq.astype(np.int32))
        self.voxels_colors = jnp.asarray((csum / cnt).astype(np.float32))

    def __iadd__(self, other: "VoxelGrid"):
        """reference: VoxelGrid::operator+= (voxelgrid.cu) — merged grids
        must share voxel_size/origin; colors of coincident voxels average."""
        if self.voxel_size != other.voxel_size:
            console.log_error("[VoxelGrid] Could not combine VoxelGrid "
                              "because voxel_size differs.")
        if not np.allclose(self.origin, other.origin):
            console.log_error("[VoxelGrid] Could not combine VoxelGrid "
                              "because origin differs.")
        self.voxels_keys = jnp.concatenate(
            [self.voxels_keys, other.voxels_keys], 0)
        self.voxels_colors = jnp.concatenate(
            [self.voxels_colors, other.voxels_colors], 0)
        self._dedup()
        return self

    def __add__(self, other: "VoxelGrid") -> "VoxelGrid":
        out = VoxelGrid()
        out.voxel_size = self.voxel_size
        out.origin = self.origin.copy()
        out.voxels_keys = self.voxels_keys
        out.voxels_colors = self.voxels_colors
        out += other
        return out

    # -- queries ----------------------------------------------------------
    def check_if_included(self, queries) -> np.ndarray:
        """Element-wise membership of query points
        (reference: voxelgrid.cu CheckIfIncluded)."""
        q = jnp.asarray(queries, jnp.float32)
        keys = jnp.floor(
            (q - jnp.asarray(self.origin)) / self.voxel_size).astype(jnp.int32)
        return np.asarray(_membership(keys, self.voxels_keys))

    # -- carving (voxelgrid.cu CarveDepthMap/CarveSilhouette) -------------
    def _carve(self, image, camera_parameter, keep_voxels_outside_image: bool):
        """Shared carve kernel: a voxel survives iff any of its 8
        boundary points hits (!inside && keep_outside) ||
        (inside && d > 0 && z >= d) — reference: compute_carve_functor,
        voxelgrid.cu:58-122 (bilinear FloatValueAt sampling)."""
        from . import image_ops

        intr = jnp.asarray(
            camera_parameter.intrinsic.intrinsic_matrix, jnp.float32)
        ext = jnp.asarray(camera_parameter.extrinsic, jnp.float32)
        img = jnp.asarray(image.to_numpy(), jnp.float32)
        if img.ndim == 2:
            img = img[..., None]
        H, W = img.shape[0], img.shape[1]

        centers = self.get_voxel_centers()
        h = self.voxel_size / 2.0
        offs = jnp.asarray([[sx, sy, sz] for sx in (-h, h)
                            for sy in (-h, h) for sz in (-h, h)], jnp.float32)
        pts = centers[:, None, :] + offs[None]                      # [N,8,3]
        pc = pts @ ext[:3, :3].T + ext[:3, 3]
        uvz = pc @ intr.T
        z = uvz[..., 2]
        u = uvz[..., 0] / z
        v = uvz[..., 1] / z
        inside = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
        d = image_ops.float_value_at(img, u, v)
        keep_pt = (~inside & bool(keep_voxels_outside_image)) | (
            inside & (d > 0) & (z >= d))
        keep = np.asarray(jnp.any(keep_pt, -1))
        self.voxels_keys = jnp.asarray(np.asarray(self.voxels_keys)[keep])
        self.voxels_colors = jnp.asarray(np.asarray(self.voxels_colors)[keep])
        return self

    def carve_depth_map(self, depth_map, camera_parameter,
                        keep_voxels_outside_image: bool = False):
        """reference: VoxelGrid::CarveDepthMap (voxelgrid.cu:378-404)."""
        if depth_map.height != camera_parameter.intrinsic.height or \
                depth_map.width != camera_parameter.intrinsic.width:
            console.log_error(
                "[VoxelGrid::CarveDepthMap] depth_map size does not match "
                "intrinsic parameters.")
        return self._carve(depth_map, camera_parameter,
                           keep_voxels_outside_image)

    def carve_silhouette(self, silhouette_mask, camera_parameter,
                         keep_voxels_outside_image: bool = False):
        """reference: VoxelGrid::CarveSilhouette (voxelgrid.cu:405-431)."""
        if silhouette_mask.height != camera_parameter.intrinsic.height or \
                silhouette_mask.width != camera_parameter.intrinsic.width:
            console.log_error(
                "[VoxelGrid::CarveSilhouette] silhouette_mask size does not "
                "match intrinsic parameters.")
        return self._carve(silhouette_mask, camera_parameter,
                           keep_voxels_outside_image)

    # -- factories ---------------------------------------------------------
    @staticmethod
    def create_dense(origin, voxel_size: float, width: float, height: float,
                     depth: float) -> "VoxelGrid":
        """reference: voxelgrid_factory.cu:131-160."""
        num_w = int(round(width / voxel_size))
        num_h = int(round(height / voxel_size))
        num_d = int(round(depth / voxel_size))
        out = VoxelGrid()
        out.voxel_size = float(voxel_size)
        out.origin = np.asarray(origin, np.float32)
        grid = np.stack(np.meshgrid(np.arange(num_w), np.arange(num_h),
                                    np.arange(num_d), indexing="ij"),
                        -1).reshape(-1, 3)
        out.voxels_keys = jnp.asarray(grid.astype(np.int32))
        out.voxels_colors = jnp.ones((len(grid), 3), jnp.float32)
        return out

    @staticmethod
    def create_from_point_cloud(input, voxel_size: float) -> "VoxelGrid":
        """reference: voxelgrid_factory.cu:221-228."""
        half = np.full(3, voxel_size * 0.5, np.float32)
        return VoxelGrid.create_from_point_cloud_within_bounds(
            input, voxel_size,
            input.get_min_bound() - half, input.get_max_bound() + half)

    @staticmethod
    def create_from_point_cloud_within_bounds(
            input, voxel_size: float, min_bound, max_bound) -> "VoxelGrid":
        """reference: voxelgrid_factory.cu:163-219."""
        if voxel_size <= 0.0:
            console.log_error("[VoxelGridFromPointCloud] voxel_size <= 0.")
        min_bound = np.asarray(min_bound, np.float32)
        max_bound = np.asarray(max_bound, np.float32)
        if voxel_size * np.iinfo(np.int32).max < (max_bound - min_bound).max():
            console.log_error("[VoxelGridFromPointCloud] voxel_size is too small.")
        out = VoxelGrid()
        out.voxel_size = float(voxel_size)
        out.origin = min_bound
        pts = np.asarray(input.points)
        keys = np.floor((pts - min_bound) / voxel_size).astype(np.int32)
        cols = (np.asarray(input.colors) if input.has_colors()
                else np.zeros_like(pts))
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        csum = np.zeros((len(uniq), 3), np.float64)
        np.add.at(csum, inv, cols)
        cnt = np.bincount(inv, minlength=len(uniq))[:, None]
        out.voxels_keys = jnp.asarray(uniq)
        out.voxels_colors = jnp.asarray((csum / cnt).astype(np.float32))
        console.log_debug(
            "Pointcloud is voxelized from %d points to %d voxels.",
            len(pts), len(uniq))
        return out

    @staticmethod
    def create_from_triangle_mesh(input, voxel_size: float) -> "VoxelGrid":
        """reference: voxelgrid_factory.cu:288-296."""
        half = np.full(3, voxel_size * 0.5, np.float32)
        return VoxelGrid.create_from_triangle_mesh_within_bounds(
            input, voxel_size,
            input.get_min_bound() - half, input.get_max_bound() + half)

    @staticmethod
    def create_from_triangle_mesh_within_bounds(
            input, voxel_size: float, min_bound, max_bound) -> "VoxelGrid":
        """Triangle/voxel-AABB overlap voxelization
        (reference: voxelgrid_factory.cu:231-286)."""
        if voxel_size <= 0.0:
            console.log_error("[CreateFromTriangleMesh] voxel_size <= 0.")
        min_bound = np.asarray(min_bound, np.float32)
        max_bound = np.asarray(max_bound, np.float32)
        out = VoxelGrid()
        out.voxel_size = float(voxel_size)
        out.origin = min_bound
        grid_size = max_bound - min_bound
        num = np.maximum(np.round(grid_size / voxel_size).astype(int), 1)
        keys = np.asarray(_voxelize_mesh(
            jnp.asarray(input.vertices), jnp.asarray(input.triangles, jnp.int32),
            jnp.asarray(min_bound), jnp.float32(voxel_size),
            int(num[0]), int(num[1]), int(num[2])))
        keys = keys[keys[:, 0] != INVALID_VOXEL_INDEX]
        out.voxels_keys = jnp.asarray(keys)
        out.voxels_colors = jnp.ones((len(keys), 3), jnp.float32)
        return out

    @staticmethod
    def create_from_occupancy_grid(input) -> "VoxelGrid":
        """reference: voxelgrid_factory.cu CreateFromOccupancyGrid —
        occupied voxels become grid voxels (grid centered on origin)."""
        out = VoxelGrid()
        out.voxel_size = float(input.voxel_size)
        half = input.resolution // 2
        out.origin = np.asarray(input.origin, np.float32) - \
            half * input.voxel_size
        idx, _, colors = input.extract_occupied_voxels()
        out.voxels_keys = jnp.asarray(np.asarray(idx, np.int32))
        out.voxels_colors = jnp.asarray(colors) if colors is not None else \
            jnp.ones((len(idx), 3), jnp.float32)
        return out


@jax.jit
def _membership(query_keys: jax.Array, grid_keys: jax.Array) -> jax.Array:
    """[Q] bool: does each query key appear in grid_keys? Linear-probe
    free: compares against all keys (fine for typical grid sizes; the
    reference also binary-searches a sorted list)."""
    if grid_keys.shape[0] == 0:
        return jnp.zeros(query_keys.shape[0], bool)
    eq = jnp.all(query_keys[:, None, :] == grid_keys[None, :, :], -1)
    return jnp.any(eq, -1)


@partial(jax.jit, static_argnames=("num_w", "num_h", "num_d"))
def _voxelize_mesh(vertices, triangles, min_bound, voxel_size,
                   num_w: int, num_h: int, num_d: int):
    """All candidate voxels tested against all triangles, tiled over
    voxels (reference: create_from_trianglemesh_functor,
    voxelgrid_factory.cu:82-129). Returns [num_w*num_h*num_d, 3] keys
    with INVALID rows for empty voxels (caller compacts)."""
    v0 = vertices[triangles[:, 0]]
    v1 = vertices[triangles[:, 1]]
    v2 = vertices[triangles[:, 2]]
    half = jnp.full((3,), voxel_size / 2.0, jnp.float32)
    n_total = num_w * num_h * num_d
    lin = jnp.arange(n_total, dtype=jnp.int32)
    wz = lin // (num_h * num_d)
    hy = (lin % (num_h * num_d)) // num_d
    dz = lin % num_d
    keys = jnp.stack([wz, hy, dz], -1)
    centers = min_bound + (keys.astype(jnp.float32) + 0.5) * voxel_size

    tile = 4096
    n_tiles = -(-n_total // tile)
    pad = n_tiles * tile - n_total
    centers_p = jnp.pad(centers, ((0, pad), (0, 0)))

    def body(c_tile):
        hit = triangle_aabb(c_tile[:, None, :], half, v0[None], v1[None],
                            v2[None])
        return jnp.any(hit, -1)

    occ = jax.lax.map(body, centers_p.reshape(n_tiles, tile, 3))
    occ = occ.reshape(-1)[:n_total]
    return jnp.where(occ[:, None], keys, INVALID_VOXEL_INDEX)
