"""DLPack interop
(reference: src/cupoch/utility/dl_converter.h:34-40 + dl_converter.cu,
exposed in Python as to_*_dlpack()/from_*_dlpack(),
cupoch_pybind/geometry/pointcloud.cpp:82-105).

jax.Arrays already speak DLPack natively; these wrappers keep the
reference's function names and add geometry-level helpers so torch /
cupy / numpy users can exchange buffers with zero copies where the
consumer supports it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def to_dlpack(array):
    """jax.Array -> DLPack-protocol object (ToDLPack,
    dl_converter.h:34). Modern JAX arrays implement ``__dlpack__``
    directly, so consumers (torch.from_dlpack, np.from_dlpack, cupy)
    take the array itself — zero-copy where the backend allows."""
    return jnp.asarray(array)


def from_dlpack(capsule_or_tensor) -> jax.Array:
    """DLPack capsule / __dlpack__ object -> jax.Array
    (FromDLPack, dl_converter.h:37-40)."""
    return jax.dlpack.from_dlpack(capsule_or_tensor)


# -- geometry-level helpers (pybind device_vector_wrapper parity) ------

def pointcloud_to_points_dlpack(pcd):
    """reference: PointCloud::to_points_dlpack
    (cupoch_pybind/geometry/pointcloud.cpp:82-90)."""
    return to_dlpack(pcd.points)


def pointcloud_from_points_dlpack(tensor):
    from ..geometry.pointcloud import PointCloud

    return PointCloud(from_dlpack(tensor))


def _install_geometry_methods():
    """Attach to_*_dlpack / from_*_dlpack to the geometry classes,
    mirroring the pybind surface."""
    from ..geometry.pointcloud import PointCloud
    from ..geometry.trianglemesh import TriangleMesh

    def to_points_dlpack(self):
        return to_dlpack(self.points)

    def to_normals_dlpack(self):
        return to_dlpack(self.normals)

    def to_colors_dlpack(self):
        return to_dlpack(self.colors)

    def from_points_dlpack(self, tensor):
        self.points = from_dlpack(tensor)

    def from_normals_dlpack(self, tensor):
        self.normals = from_dlpack(tensor)

    def from_colors_dlpack(self, tensor):
        self.colors = from_dlpack(tensor)

    PointCloud.to_points_dlpack = to_points_dlpack
    PointCloud.to_normals_dlpack = to_normals_dlpack
    PointCloud.to_colors_dlpack = to_colors_dlpack
    PointCloud.from_points_dlpack = from_points_dlpack
    PointCloud.from_normals_dlpack = from_normals_dlpack
    PointCloud.from_colors_dlpack = from_colors_dlpack

    def to_vertices_dlpack(self):
        return to_dlpack(self.vertices)

    def from_vertices_dlpack(self, tensor):
        self.vertices = from_dlpack(tensor)

    TriangleMesh.to_vertices_dlpack = to_vertices_dlpack
    TriangleMesh.from_vertices_dlpack = from_vertices_dlpack


_install_geometry_methods()
