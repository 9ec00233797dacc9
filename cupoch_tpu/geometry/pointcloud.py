"""PointCloud container (reference: src/cupoch/geometry/pointcloud.h:43-263).

A host-side handle over jax Arrays (points/normals/colors/covariances
SoA, exactly the reference's field layout, pointcloud.h:259-262).
Methods are eager wrappers around the jit-safe kernels in
`pointcloud_ops` / `knn`: inputs are padded to power-of-two buckets so
the set of compiled programs stays small, results are compacted back to
exact size.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import knn as knn_mod
from ..knn import (
    KDTreeSearchParam,
    KDTreeSearchParamKNN,
    KDTreeSearchParamRadius,
)
from ..utility import console, transforms
from ..utility.shape import bucket_size, pad_axis0, valid_mask
from . import pointcloud_ops as ops
from .boundingvolume import AxisAlignedBoundingBox, OrientedBoundingBox
from .geometry import Geometry3D, GeometryType, asarray_f32


def _pad_cloud(points, mask_extra=None):
    n = points.shape[0]
    cap = bucket_size(n)
    mask = valid_mask(n, cap)
    return pad_axis0(points, cap), mask


class PointCloud(Geometry3D):
    def __init__(self, points=None):
        super().__init__(GeometryType.PointCloud)
        self.points = asarray_f32(points if points is not None else np.zeros((0, 3)))
        self.normals = None
        self.colors = None
        self.covariances = None

    # -- attribute plumbing -------------------------------------------
    @property
    def points(self) -> jax.Array:
        return self._points

    @points.setter
    def points(self, v):
        self._points = asarray_f32(v)

    @property
    def normals(self):
        return self._normals

    @normals.setter
    def normals(self, v):
        self._normals = None if v is None else asarray_f32(v)

    @property
    def colors(self):
        return self._colors

    @colors.setter
    def colors(self, v):
        self._colors = None if v is None else asarray_f32(v)

    @property
    def covariances(self):
        return self._covariances

    @covariances.setter
    def covariances(self, v):
        self._covariances = None if v is None else jnp.asarray(v, jnp.float32)

    def _primary_points(self):
        return self.points

    # -- predicates (pointcloud.h:66-92) --------------------------------
    def has_points(self) -> bool:
        return self.points.shape[0] > 0

    def has_normals(self) -> bool:
        return self.normals is not None and self.normals.shape[0] == self.points.shape[0] and self.points.shape[0] > 0

    def has_colors(self) -> bool:
        return self.colors is not None and self.colors.shape[0] == self.points.shape[0] and self.points.shape[0] > 0

    def has_covariances(self) -> bool:
        return self.covariances is not None and self.covariances.shape[0] == self.points.shape[0] and self.points.shape[0] > 0

    def __len__(self):
        return int(self.points.shape[0])

    def __repr__(self):
        return f"PointCloud with {len(self)} points."

    def clear(self):
        self.points = np.zeros((0, 3), np.float32)
        self.normals = None
        self.colors = None
        self.covariances = None
        return self

    def is_empty(self) -> bool:
        return not self.has_points()

    # -- simple ops -----------------------------------------------------
    def normalize_normals(self):
        if self.has_normals():
            n = self.normals
            self.normals = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        return self

    def paint_uniform_color(self, color):
        self.colors = jnp.broadcast_to(
            jnp.asarray(color, jnp.float32), (len(self), 3)
        )
        return self

    def transform(self, T):
        T = jnp.asarray(T, jnp.float32)
        self.points = transforms.transform_points(T, self.points)
        if self.has_normals():
            self.normals = transforms.rotate_normals(T, self.normals)
        if self.has_covariances():
            R = T[:3, :3]
            self.covariances = jnp.einsum("ij,njk,lk->nil", R, self.covariances, R)
        return self

    def translate(self, translation, relative: bool = True):
        t = jnp.asarray(translation, jnp.float32)
        if relative:
            self.points = self.points + t
        else:
            self.points = self.points - jnp.mean(self.points, 0) + t
        return self

    def scale(self, s, center: bool = True):
        if center:
            c = jnp.mean(self.points, 0)
            self.points = (self.points - c) * s + c
        else:
            self.points = self.points * s
        return self

    def rotate(self, R, center: bool = True):
        R = jnp.asarray(R, jnp.float32)
        if center:
            c = jnp.mean(self.points, 0)
            self.points = (self.points - c) @ R.T + c
        else:
            self.points = self.points @ R.T
        if self.has_normals():
            self.normals = self.normals @ R.T
        return self

    def __iadd__(self, other: "PointCloud"):
        merged = self + other
        self.points = merged.points
        self.normals = merged.normals
        self.colors = merged.colors
        return self

    def __add__(self, other: "PointCloud") -> "PointCloud":
        out = PointCloud(jnp.concatenate([self.points, other.points], 0))
        if self.has_normals() and other.has_normals():
            out.normals = jnp.concatenate([self.normals, other.normals], 0)
        if self.has_colors() and other.has_colors():
            out.colors = jnp.concatenate([self.colors, other.colors], 0)
        return out

    # -- bounding volumes -------------------------------------------------
    def get_axis_aligned_bounding_box(self) -> AxisAlignedBoundingBox:
        return AxisAlignedBoundingBox.create_from_points(self.points)

    def get_oriented_bounding_box(self) -> OrientedBoundingBox:
        return OrientedBoundingBox.create_from_points(self.points)

    # -- selection / crop (pointcloud.h:119-173) ---------------------------
    def select_by_index(self, indices, invert: bool = False) -> "PointCloud":
        idx = np.asarray(indices, np.int64)
        if invert:
            keep = np.ones(len(self), bool)
            keep[idx] = False
            idx = np.nonzero(keep)[0]
        return self._gather(idx)

    def select_by_mask(self, mask, invert: bool = False) -> "PointCloud":
        m = np.asarray(mask, bool)
        if invert:
            m = ~m
        return self._gather(np.nonzero(m)[0])

    def _gather(self, idx: np.ndarray) -> "PointCloud":
        out = PointCloud(jnp.take(self.points, jnp.asarray(idx), axis=0))
        if self.has_normals():
            out.normals = jnp.take(self.normals, jnp.asarray(idx), axis=0)
        if self.has_colors():
            out.colors = jnp.take(self.colors, jnp.asarray(idx), axis=0)
        if self.has_covariances():
            out.covariances = jnp.take(self.covariances, jnp.asarray(idx), axis=0)
        return out

    def crop(self, bbox) -> "PointCloud":
        m = bbox.contains_mask(self.points)
        return self.select_by_mask(np.asarray(m))

    # -- downsampling ------------------------------------------------------
    def voxel_down_sample(self, voxel_size: float) -> "PointCloud":
        if voxel_size <= 0:
            console.log_warning("[voxel_down_sample] voxel_size <= 0.")
            return PointCloud()
        pts, mask = _pad_cloud(self.points)
        normals = pad_axis0(self.normals, pts.shape[0]) if self.has_normals() else None
        colors = pad_axis0(self.colors, pts.shape[0]) if self.has_colors() else None
        op, on, oc, om = ops.voxel_down_sample(
            pts, mask, jnp.float32(voxel_size), normals, colors
        )
        sel = np.nonzero(np.asarray(om))[0]
        out = PointCloud(np.asarray(op)[sel])
        if on is not None:
            out.normals = np.asarray(on)[sel]
        if oc is not None:
            out.colors = np.asarray(oc)[sel]
        return out

    def uniform_down_sample(self, every_k_points: int) -> "PointCloud":
        if every_k_points == 0:
            console.log_error("[uniform_down_sample] Illegal sample rate.")
        return self._gather(np.arange(0, len(self), every_k_points))

    def farthest_point_down_sample(self, num_samples: int) -> "PointCloud":
        num_samples = min(num_samples, len(self))
        pts, mask = _pad_cloud(self.points)
        idx = ops.farthest_point_indices(pts, mask, num_samples)
        return self._gather(np.asarray(idx))

    # -- outlier removal -----------------------------------------------------
    def remove_radius_outliers(self, nb_points: int, search_radius: float):
        if nb_points < 1 or search_radius <= 0:
            console.log_error("[remove_radius_outliers] Illegal input parameters")
        pts, mask = _pad_cloud(self.points)
        keep = ops.radius_outlier_mask(pts, mask, nb_points, search_radius)
        idx = np.nonzero(np.asarray(keep)[: len(self)])[0]
        return self._gather(idx), idx

    def remove_statistical_outliers(self, nb_neighbors: int, std_ratio: float):
        if nb_neighbors < 1 or std_ratio <= 0:
            console.log_error("[remove_statistical_outliers] Illegal input parameters")
        pts, mask = _pad_cloud(self.points)
        keep = ops.statistical_outlier_mask(pts, mask, nb_neighbors, std_ratio)
        idx = np.nonzero(np.asarray(keep)[: len(self)])[0]
        return self._gather(idx), idx

    # -- filters -------------------------------------------------------------
    def gaussian_filter(self, search_radius: float, sigma2: float, max_nn: int = 32):
        pts, mask = _pad_cloud(self.points)
        out = ops.gaussian_filter(pts, mask, search_radius, sigma2, max_nn)
        res = PointCloud(out[: len(self)])
        res.normals, res.colors = self.normals, self.colors
        return res

    def pass_through_filter(self, axis_no: int, min_bound: float, max_bound: float):
        m = ops.pass_through_filter_mask(
            self.points, jnp.ones(len(self), bool), axis_no, min_bound, max_bound
        )
        return self.select_by_mask(np.asarray(m))

    # -- normals ---------------------------------------------------------------
    def estimate_normals(
        self, search_param: KDTreeSearchParam = KDTreeSearchParamKNN(30)
    ):
        # queries stay UNPADDED: bucket-padding them piles the zero
        # fill into one grid cell and blows the planner's per-cell
        # query pool (measured 3x the whole call's cost); the padded
        # data side is masked instead
        pts, mask = _pad_cloud(self.points)
        idx, _ = knn_mod.search_neighbors(self.points, pts,
                                          search_param,
                                          data_mask=mask)
        cov, cnt = ops.covariances_from_neighbors(pts, idx)
        normals = ops.normals_from_covariances(cov, cnt)
        self.normals = normals[: len(self)]
        return True

    def estimate_covariances(
        self, search_param: KDTreeSearchParam = KDTreeSearchParamKNN(30)
    ):
        pts, mask = _pad_cloud(self.points)
        idx, _ = knn_mod.search_neighbors(self.points, pts,
                                          search_param,
                                          data_mask=mask)
        cov, _ = ops.covariances_from_neighbors(pts, idx)
        self.covariances = cov[: len(self)]
        return True

    def orient_normals_to_align_with_direction(self, orientation_reference=(0.0, 0.0, 1.0)):
        if not self.has_normals():
            console.log_error("[orient_normals] No normals in the PointCloud.")
        self.normals = ops.orient_normals_to_align_with_direction(
            self.normals, jnp.asarray(orientation_reference, jnp.float32)
        )
        return True

    def orient_normals_towards_camera_location(self, camera_location=(0.0, 0.0, 0.0)):
        if not self.has_normals():
            console.log_error("[orient_normals] No normals in the PointCloud.")
        self.normals = ops.orient_normals_towards_camera_location(
            self.points, self.normals, jnp.asarray(camera_location, jnp.float32)
        )
        return True

    # -- clustering / segmentation ------------------------------------------------
    def cluster_dbscan(
        self, eps: float, min_points: int, print_progress: bool = False
    ) -> np.ndarray:
        pts, mask = _pad_cloud(self.points)
        labels = ops.cluster_dbscan(pts, mask, eps, min_points)
        return ops.densify_labels(np.asarray(labels)[: len(self)])

    def segment_plane(
        self,
        distance_threshold: float,
        ransac_n: int = 3,
        num_iterations: int = 100,
        seed: int = 0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        pts, mask = _pad_cloud(self.points)
        plane, inl = ops.segment_plane(
            pts, mask, distance_threshold, num_iterations, jax.random.PRNGKey(seed)
        )
        return np.asarray(plane), np.nonzero(np.asarray(inl)[: len(self)])[0]

    # -- factories (reference: pointcloud_factory.cu) ---------------------------
    @staticmethod
    def create_from_depth_image(depth, intrinsic, extrinsic=None,
                                depth_scale: float = 1000.0,
                                depth_trunc: float = 1000.0,
                                stride: int = 1) -> "PointCloud":
        from . import pointcloud_factory as factory

        return factory.create_from_depth_image(
            depth, intrinsic, extrinsic, depth_scale, depth_trunc, stride)

    @staticmethod
    def create_from_rgbd_image(image, intrinsic, extrinsic=None,
                               project_valid_depth_only: bool = True,
                               depth_cutoff: float = -1.0,
                               compute_normals: bool = False) -> "PointCloud":
        from . import pointcloud_factory as factory

        return factory.create_from_rgbd_image(
            image, intrinsic, extrinsic, project_valid_depth_only,
            depth_cutoff, compute_normals)

    @staticmethod
    def create_from_laserscanbuffer(scan, min_range: float,
                                    max_range: float) -> "PointCloud":
        from . import pointcloud_factory as factory

        return factory.create_from_laserscanbuffer(scan, min_range, max_range)

    @staticmethod
    def create_from_occupancygrid(occgrid) -> "PointCloud":
        from . import pointcloud_factory as factory

        return factory.create_from_occupancy_grid(occgrid)

    @staticmethod
    def create_from_disparity(disp, color, left_intrinsic, right_intrinsic,
                              baseline: float) -> "PointCloud":
        from . import pointcloud_factory as factory

        return factory.create_from_disparity(
            disp, color, left_intrinsic, right_intrinsic, baseline)

    # -- numpy bridge ----------------------------------------------------------
    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.points)

    @staticmethod
    def from_numpy(arr) -> "PointCloud":
        return PointCloud(np.asarray(arr, np.float32))
