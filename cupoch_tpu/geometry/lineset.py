"""LineSet container (2D/3D).

reference: src/cupoch/geometry/lineset.{h,cu} — points + [E,2] line
index pairs + per-line colors, with the usual transform ops.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utility import transforms
from .boundingvolume import AxisAlignedBoundingBox
from .geometry import Geometry, GeometryType

DEFAULT_LINE_COLOR = np.ones(3, np.float32)  # lineset.h:46


class LineSet(Geometry):
    def __init__(self, points=None, lines=None, dim: int = 3,
                 gtype: GeometryType = GeometryType.LineSet):
        super().__init__(gtype, dim)
        self.dim = dim
        self.points = (jnp.zeros((0, dim), jnp.float32) if points is None
                       else jnp.asarray(np.asarray(points, np.float32)))
        self.lines = (jnp.zeros((0, 2), jnp.int32) if lines is None
                      else jnp.asarray(np.asarray(lines, np.int32)))
        self.colors = jnp.zeros((0, 3), jnp.float32)

    @staticmethod
    def from_path(path, dim: int = 3) -> "LineSet":
        """Poly-line through consecutive path points
        (reference: lineset.h LineSet(path))."""
        path = np.asarray(path, np.float32)
        n = len(path)
        lines = np.stack([np.arange(n - 1), np.arange(1, n)], -1)
        return LineSet(path, lines, dim=dim)

    # -- basics -----------------------------------------------------------
    def __repr__(self):
        return (f"LineSet with {int(self.lines.shape[0])} lines and "
                f"{int(self.points.shape[0])} points.")

    def has_points(self) -> bool:
        return self.points.shape[0] > 0

    def has_lines(self) -> bool:
        return self.lines.shape[0] > 0

    def has_colors(self) -> bool:
        return (self.colors.shape[0] > 0
                and self.colors.shape[0] == self.lines.shape[0])

    def is_empty(self) -> bool:
        return not self.has_points()

    def clear(self):
        self.points = jnp.zeros((0, self.dim), jnp.float32)
        self.lines = jnp.zeros((0, 2), jnp.int32)
        self.colors = jnp.zeros((0, 3), jnp.float32)
        return self

    def get_line_coordinate(self, line_index: int):
        li = np.asarray(self.lines[line_index])
        return (np.asarray(self.points[li[0]]), np.asarray(self.points[li[1]]))

    def get_min_bound(self) -> np.ndarray:
        if self.is_empty():
            return np.zeros(self.dim, np.float32)
        return np.asarray(jnp.min(self.points, 0))

    def get_max_bound(self) -> np.ndarray:
        if self.is_empty():
            return np.zeros(self.dim, np.float32)
        return np.asarray(jnp.max(self.points, 0))

    def get_center(self) -> np.ndarray:
        if self.is_empty():
            return np.zeros(self.dim, np.float32)
        return np.asarray(jnp.mean(self.points, 0))

    def get_axis_aligned_bounding_box(self):
        return AxisAlignedBoundingBox(self.get_min_bound(),
                                      self.get_max_bound())

    def paint_uniform_color(self, color):
        self.colors = jnp.broadcast_to(
            jnp.asarray(color, jnp.float32),
            (int(self.lines.shape[0]), 3))
        return self

    # -- transforms ---------------------------------------------------------
    def transform(self, T):
        T = jnp.asarray(T, jnp.float32)
        if self.dim == 3:
            self.points = transforms.transform_points(T, self.points)
        else:
            self.points = self.points @ T[:2, :2].T + T[:2, 2]
        return self

    def translate(self, t, relative: bool = True):
        t = jnp.asarray(t, jnp.float32)
        if not relative:
            t = t - jnp.mean(self.points, 0)
        self.points = self.points + t
        return self

    def scale(self, s: float, center: bool = True):
        if center and self.has_points():
            c = jnp.mean(self.points, 0)
            self.points = (self.points - c) * s + c
        else:
            self.points = self.points * s
        return self

    def rotate(self, R, center: bool = True):
        R = jnp.asarray(R, jnp.float32)
        pts = self.points
        if center and self.has_points():
            c = jnp.mean(pts, 0)
            self.points = (pts - c) @ R.T + c
        else:
            self.points = pts @ R.T
        return self
