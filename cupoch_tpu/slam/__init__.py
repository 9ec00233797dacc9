"""Distributed SLAM backend (new scope per SURVEY.md §7.9 /
BASELINE.json north star: keyframe/map-block partitioning, sharded
pose-graph GN, distributed Schur-complement BA, checkpoint/resume)."""
from .bundle_adjustment import (
    BAProblem,
    BLOCK_AXIS,
    bundle_adjustment,
    make_block_mesh,
    reprojection_rmse,
)
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .pose_graph import (
    EDGE_AXIS,
    GlobalOptimizationOption,
    PoseGraph,
    PoseGraphEdge,
    PoseGraphNode,
    global_optimization,
)
from .slam import RGBDSlam, SlamOption

__all__ = [
    "BAProblem",
    "bundle_adjustment",
    "make_block_mesh",
    "reprojection_rmse",
    "BLOCK_AXIS",
    "EDGE_AXIS",
    "PoseGraph",
    "PoseGraphNode",
    "PoseGraphEdge",
    "GlobalOptimizationOption",
    "global_optimization",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "RGBDSlam",
    "SlamOption",
]
