"""Geometry containers and per-container algorithms
(TPU-native replacement for src/cupoch/geometry/)."""
from .boundingvolume import AxisAlignedBoundingBox, OrientedBoundingBox
from .geometry import Geometry, Geometry2D, Geometry3D, GeometryType
from .pointcloud import PointCloud

# KDTree classes are re-exported here for cupoch API parity
# (cupoch exposes them under cupoch.geometry as well).
from ..knn import (
    KDTreeFlann,
    KDTreeSearchParam,
    KDTreeSearchParamKNN,
    KDTreeSearchParamRadius,
    KDTreeSearchParamHybrid,
)

__all__ = [
    "Geometry",
    "Geometry2D",
    "Geometry3D",
    "GeometryType",
    "PointCloud",
    "AxisAlignedBoundingBox",
    "OrientedBoundingBox",
    "KDTreeFlann",
    "KDTreeSearchParam",
    "KDTreeSearchParamKNN",
    "KDTreeSearchParamRadius",
    "KDTreeSearchParamHybrid",
]
