"""Axis-aligned and oriented bounding boxes.

reference: src/cupoch/geometry/boundingvolume.h:41-200 / boundingvolume.cu.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utility import eigen as ueigen
from ..utility import transforms
from .geometry import Geometry3D, GeometryType


class AxisAlignedBoundingBox(Geometry3D):
    def __init__(self, min_bound=(0.0, 0.0, 0.0), max_bound=(0.0, 0.0, 0.0)):
        super().__init__(GeometryType.AxisAlignedBoundingBox)
        self.min_bound = jnp.asarray(min_bound, jnp.float32)
        self.max_bound = jnp.asarray(max_bound, jnp.float32)
        self.color = jnp.ones(3, jnp.float32)

    # -- Geometry3D ---------------------------------------------------
    def _primary_points(self):
        return self.get_box_points()

    def clear(self):
        self.min_bound = jnp.zeros(3, jnp.float32)
        self.max_bound = jnp.zeros(3, jnp.float32)
        return self

    def is_empty(self) -> bool:
        return bool(jnp.any(self.max_bound <= self.min_bound))

    def get_min_bound(self):
        return np.asarray(self.min_bound)

    def get_max_bound(self):
        return np.asarray(self.max_bound)

    def get_center(self):
        return np.asarray((self.min_bound + self.max_bound) * 0.5)

    def get_extent(self):
        return np.asarray(self.max_bound - self.min_bound)

    def get_half_extent(self):
        return self.get_extent() * 0.5

    def get_max_extent(self) -> float:
        return float(jnp.max(self.max_bound - self.min_bound))

    def volume(self) -> float:
        return float(jnp.prod(self.max_bound - self.min_bound))

    def get_box_points(self) -> jax.Array:
        mn, mx = self.min_bound, self.max_bound
        corners = jnp.asarray(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
             [1, 1, 1], [0, 1, 1], [1, 0, 1], [1, 1, 0]],
            jnp.float32,
        )
        return mn + corners * (mx - mn)

    def get_point_indices_within_bounding_box(self, points) -> np.ndarray:
        points = jnp.asarray(points, jnp.float32)
        inside = jnp.all((points >= self.min_bound) & (points <= self.max_bound), -1)
        return np.nonzero(np.asarray(inside))[0]

    def contains_mask(self, points: jax.Array) -> jax.Array:
        return jnp.all((points >= self.min_bound) & (points <= self.max_bound), -1)

    def transform(self, T):
        # AABB of the transformed corners (reference boundingvolume.cu)
        pts = transforms.transform_points(jnp.asarray(T, jnp.float32), self.get_box_points())
        self.min_bound = jnp.min(pts, 0)
        self.max_bound = jnp.max(pts, 0)
        return self

    def translate(self, translation, relative: bool = True):
        t = jnp.asarray(translation, jnp.float32)
        if relative:
            self.min_bound = self.min_bound + t
            self.max_bound = self.max_bound + t
        else:
            half = (self.max_bound - self.min_bound) * 0.5
            self.min_bound = t - half
            self.max_bound = t + half
        return self

    def scale(self, s, center: bool = True):
        if center:
            c = (self.min_bound + self.max_bound) * 0.5
            self.min_bound = (self.min_bound - c) * s + c
            self.max_bound = (self.max_bound - c) * s + c
        else:
            self.min_bound = self.min_bound * s
            self.max_bound = self.max_bound * s
        return self

    @staticmethod
    def create_from_points(points, mask: Optional[jax.Array] = None):
        points = jnp.asarray(points, jnp.float32)
        if mask is not None:
            big = jnp.float32(3e38)
            mn = jnp.min(jnp.where(mask[:, None], points, big), 0)
            mx = jnp.max(jnp.where(mask[:, None], points, -big), 0)
        else:
            mn = jnp.min(points, 0)
            mx = jnp.max(points, 0)
        return AxisAlignedBoundingBox(mn, mx)

    def __repr__(self):
        return (f"AxisAlignedBoundingBox(min={np.asarray(self.min_bound)}, "
                f"max={np.asarray(self.max_bound)})")


class OrientedBoundingBox(Geometry3D):
    def __init__(self, center=(0, 0, 0), R=None, extent=(0, 0, 0)):
        super().__init__(GeometryType.OrientedBoundingBox)
        self.center = jnp.asarray(center, jnp.float32)
        self.R = jnp.eye(3, dtype=jnp.float32) if R is None else jnp.asarray(R, jnp.float32)
        self.extent = jnp.asarray(extent, jnp.float32)
        self.color = jnp.ones(3, jnp.float32)

    def _primary_points(self):
        return self.get_box_points()

    def clear(self):
        self.__init__()
        return self

    def is_empty(self) -> bool:
        return bool(jnp.all(self.extent <= 0))

    def get_center(self):
        return np.asarray(self.center)

    def volume(self) -> float:
        return float(jnp.prod(self.extent))

    def get_box_points(self) -> jax.Array:
        signs = jnp.asarray(
            [[-1, -1, -1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1],
             [1, 1, 1], [-1, 1, 1], [1, -1, 1], [1, 1, -1]],
            jnp.float32,
        )
        local = signs * (self.extent * 0.5)
        return self.center + local @ self.R.T

    def contains_mask(self, points: jax.Array) -> jax.Array:
        local = (jnp.asarray(points, jnp.float32) - self.center) @ self.R
        half = self.extent * 0.5
        return jnp.all(jnp.abs(local) <= half, -1)

    def get_point_indices_within_bounding_box(self, points) -> np.ndarray:
        return np.nonzero(np.asarray(self.contains_mask(points)))[0]

    def transform(self, T):
        T = jnp.asarray(T, jnp.float32)
        self.center = transforms.transform_points(T, self.center[None])[0]
        self.R = T[:3, :3] @ self.R
        return self

    def translate(self, translation, relative: bool = True):
        t = jnp.asarray(translation, jnp.float32)
        self.center = self.center + t if relative else t
        return self

    def rotate(self, R, center: bool = True):
        R = jnp.asarray(R, jnp.float32)
        self.R = R @ self.R
        if not center:
            self.center = R @ self.center
        return self

    def scale(self, s, center: bool = True):
        self.extent = self.extent * s
        if not center:
            self.center = self.center * s
        return self

    def get_axis_aligned_bounding_box(self) -> AxisAlignedBoundingBox:
        return AxisAlignedBoundingBox.create_from_points(self.get_box_points())

    @staticmethod
    def create_from_points(points, mask: Optional[jax.Array] = None):
        """PCA box (reference: boundingvolume.cu CreateFromPoints)."""
        points = jnp.asarray(points, jnp.float32)
        if mask is None:
            mask = jnp.ones(points.shape[0], bool)
        w = mask.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(points * w[:, None], 0) / n
        centered = (points - mean) * w[:, None]
        cov = centered.T @ centered / n
        _, vecs = ueigen.symeig3x3(cov)
        R = vecs  # columns are eigenvectors
        # right-handed
        det = jnp.linalg.det(R)
        R = R * jnp.asarray([1.0, 1.0, 1.0]) * jnp.where(det < 0, -1.0, 1.0)
        local = (points - mean) @ R
        big = jnp.float32(3e38)
        mn = jnp.min(jnp.where(mask[:, None], local, big), 0)
        mx = jnp.max(jnp.where(mask[:, None], local, -big), 0)
        center = mean + R @ ((mn + mx) * 0.5)
        return OrientedBoundingBox(center, R, mx - mn)

    def __repr__(self):
        return (f"OrientedBoundingBox(center={np.asarray(self.center)}, "
                f"extent={np.asarray(self.extent)})")
