"""Geometry base classes.

Mirrors the reference's abstract hierarchy
(src/cupoch/geometry/geometry.h:37-67 and geometry_base.h:33-119) with
a TPU-native twist: containers are *host-side handles* holding
`jax.Array` fields; all computation happens in the functional kernels
under `cupoch_tpu.geometry.*`/`cupoch_tpu.knn.*` which are pure,
jittable, and shape-static. Methods on containers are thin eager
wrappers that pad to bucketed capacities, call the jitted kernels, and
compact results — so user code keeps cupoch's dynamic-size feel while
the device only ever sees static shapes.
"""
from __future__ import annotations

import enum
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class GeometryType(enum.IntEnum):
    """Matches reference geometry.h:37-67 values exactly."""

    Unspecified = 0
    PointCloud = 1
    VoxelGrid = 2
    OccupancyGrid = 3
    DistanceTransform = 4
    LineSet = 5
    Graph = 6
    MeshBase = 7
    TriangleMesh = 8
    Image = 9
    RGBDImage = 10
    Map2D = 11
    OrientedBoundingBox = 12
    AxisAlignedBoundingBox = 13
    LaserScanBuffer = 14


def asarray_f32(x, shape_suffix: Tuple[int, ...] = (3,)) -> jax.Array:
    """Coerce input (list / numpy / jax) to float32 [N, *shape_suffix]."""
    a = jnp.asarray(x, dtype=jnp.float32)
    if a.ndim == 1 and a.size == 0:
        a = a.reshape((0,) + shape_suffix)
    return a


class Geometry:
    def __init__(self, geometry_type: GeometryType, dimension: int):
        self._geometry_type = GeometryType(geometry_type)
        self._dimension = dimension

    def get_geometry_type(self) -> GeometryType:
        return self._geometry_type

    def dimension(self) -> int:
        return self._dimension

    # subclasses implement: clear, is_empty, transform, ...


class Geometry3D(Geometry):
    """Base for 3D geometries: shared transform/bound plumbing
    (reference geometry_base.h GeometryBase3D)."""

    def __init__(self, geometry_type: GeometryType):
        super().__init__(geometry_type, 3)

    # --- to be provided by subclasses ------------------------------
    def _primary_points(self) -> jax.Array:
        raise NotImplementedError

    def get_min_bound(self) -> np.ndarray:
        pts = self._primary_points()
        if pts.shape[0] == 0:
            return np.zeros(3, np.float32)
        return np.asarray(jnp.min(pts, axis=0))

    def get_max_bound(self) -> np.ndarray:
        pts = self._primary_points()
        if pts.shape[0] == 0:
            return np.zeros(3, np.float32)
        return np.asarray(jnp.max(pts, axis=0))

    def get_center(self) -> np.ndarray:
        pts = self._primary_points()
        if pts.shape[0] == 0:
            return np.zeros(3, np.float32)
        return np.asarray(jnp.mean(pts, axis=0))


class Geometry2D(Geometry):
    def __init__(self, geometry_type: GeometryType):
        super().__init__(geometry_type, 2)
