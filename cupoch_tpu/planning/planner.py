"""Probabilistic-roadmap-style 3D position planner.

reference: src/cupoch/planning/planner.{h,cu} (planner.h:31-67,
planner.cu:35-130). Obstacle edges get infinite weight (the reference's
RemoveCollisionEdges, planner.cu:62-107) and the path comes from the
graph's device-side SSSP.
"""
from __future__ import annotations

import copy
from typing import List, Optional

import numpy as np

from ..collision import compute_intersection
from ..geometry.graph import Graph
from ..geometry.occupancygrid import OccupancyGrid
from ..geometry.voxelgrid import VoxelGrid
from ..utility import console


class PlannerBase:
    """reference: planner.h:31-45."""

    def __init__(self):
        self.obstacles = []

    def add_obstacle(self, obstacle):
        self.obstacles.append(obstacle)
        return self

    def find_path(self, start, goal):
        raise NotImplementedError


class Pos3DPlanner(PlannerBase):
    """reference: planner.h:47-67 (same defaults)."""

    def __init__(self, graph: Graph, object_radius: float = 0.1,
                 max_edge_distance: float = 1.0):
        super().__init__()
        self.graph = copy.deepcopy(graph)
        self.object_radius = float(object_radius)
        self.max_edge_distance = float(max_edge_distance)

    def update_graph(self):
        self._remove_collision_edges(self.graph)
        return self

    def _remove_collision_edges(self, graph: Graph):
        """reference: Pos3DPlanner::RemoveCollisionEdges
        (planner.cu:62-107) — colliding edges get weight = inf."""
        graph.set_edge_weights_from_distance()
        for obstacle in self.obstacles:
            if isinstance(obstacle, (VoxelGrid, OccupancyGrid)):
                res = compute_intersection(obstacle, graph,
                                           self.object_radius)
            else:
                console.log_error("Unsupported obstacle type.")
            if res.is_collided():
                edge_ids = res.get_collision_index_pairs()[:, 1]
                w = np.asarray(graph.edge_weights).copy()
                w[np.unique(edge_ids)] = np.inf
                import jax.numpy as jnp

                graph.edge_weights = jnp.asarray(w)

    def find_path(self, start, goal) -> List[np.ndarray]:
        """reference: Pos3DPlanner::FindPath (planner.cu:109-130)."""
        ex = copy.deepcopy(self.graph)
        n_start = int(ex.points.shape[0])
        n_goal = n_start + 1
        ex.add_node_and_connect(np.asarray(start, np.float32),
                                self.max_edge_distance, lazy_add=True)
        ex.add_node_and_connect(np.asarray(goal, np.float32),
                                self.max_edge_distance, lazy_add=False)
        self._remove_collision_edges(ex)
        path_idx, dist = ex.dijkstra_path(n_start, n_goal)
        if not np.isfinite(dist):
            return []
        pts = np.asarray(ex.points)
        return [pts[i] for i in path_idx]
