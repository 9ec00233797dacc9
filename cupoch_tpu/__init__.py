"""cupoch_tpu — a TPU-native 3D data-processing library for robotics.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
neka-nat/cupoch (GPU point clouds, registration, odometry, TSDF fusion,
occupancy grids, collision, planning, kinematics, IO) plus first-class
multi-chip scaling via jax.sharding.

Usage mirrors cupoch:

    import cupoch_tpu as cph
    pcd = cph.io.read_point_cloud("fragment.pcd")
    pcd = pcd.voxel_down_sample(0.005)
    pcd.estimate_normals()
"""
from . import geometry, knn, utility

# installs to_*_dlpack / from_*_dlpack methods on geometry classes
# (reference: cupoch_pybind/geometry/pointcloud.cpp:82-105)
from .utility import dl_converter  # noqa: E402  (import for side effect)

__version__ = "0.1.0"

__all__ = ["geometry", "knn", "utility", "__version__"]

# Subpackages with heavier deps are imported lazily to keep import fast.
_LAZY = (
    "registration",
    "odometry",
    "integration",
    "kinfu",
    "collision",
    "planning",
    "kinematics",
    "imageproc",
    "io",
    "visualization",
    "parallel",
    "camera",
    "slam",
)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module 'cupoch_tpu' has no attribute {name!r}")
