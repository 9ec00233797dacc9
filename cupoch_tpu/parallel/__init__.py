"""Multi-chip / multi-host scaling (new scope vs the single-GPU
reference; see SURVEY.md §2.13 and §7 step 9)."""
from .sharded import (
    POINTS_AXIS,
    make_point_mesh,
    ring_sharded_pool_icp_fn,
    ring_sharded_registration_icp,
    sharded_icp_fn,
    sharded_registration_icp,
    sharded_transform,
)

__all__ = [
    "POINTS_AXIS",
    "make_point_mesh",
    "ring_sharded_pool_icp_fn",
    "ring_sharded_registration_icp",
    "sharded_icp_fn",
    "sharded_registration_icp",
    "sharded_transform",
]
