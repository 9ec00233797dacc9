"""Geometry containers and per-container algorithms
(TPU-native replacement for src/cupoch/geometry/)."""
from . import intersection_test
from .boundingvolume import AxisAlignedBoundingBox, OrientedBoundingBox
from .distancetransform import DistanceTransform
from .geometry import Geometry, Geometry2D, Geometry3D, GeometryType
from .graph import Graph, SSSPResult
from .image import FilterType, Image, RGBDImage
from .keypoint import compute_iss_keypoints
from .laserscanbuffer import LaserScanBuffer
from .lineset import LineSet
from .map2d import Map2D
from .occupancygrid import OccupancyGrid, OccupancyVoxel
from .pointcloud import PointCloud
from .trianglemesh import MeshBase, TriangleMesh
from .voxelgrid import Voxel, VoxelGrid

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
    "TriangleMesh",
    "MeshBase",
    "Image",
    "RGBDImage",
    "FilterType",
    "AxisAlignedBoundingBox",
    "OrientedBoundingBox",
    "Voxel",
    "VoxelGrid",
    "OccupancyGrid",
    "OccupancyVoxel",
    "DistanceTransform",
    "LaserScanBuffer",
    "Map2D",
    "compute_iss_keypoints",
    "LineSet",
    "Graph",
    "SSSPResult",
    "intersection_test",
    "KDTreeFlann",
    "KDTreeSearchParam",
    "KDTreeSearchParamKNN",
    "KDTreeSearchParamRadius",
    "KDTreeSearchParamHybrid",
]
