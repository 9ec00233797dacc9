"""Graph over LineSet with single-source shortest paths.

reference: src/cupoch/geometry/graph.{h,cu} (graph.h:29-128). The
reference's GPU Dijkstra is an iterative frontier relaxation over a CSR
edge table (relax/update functors, graph.cu:65-136) driven from the
host until convergence. The TPU form is the same fixed-point but as ONE
`lax.while_loop` of dense scatter-min relaxations over the [E] edge
list — no CSR needed, no host round-trips, predecessors recovered with
one extra pass at the fixed point.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utility import console
from .geometry import GeometryType
from .lineset import LineSet


class SSSPResult:
    """reference: graph.h:31-44."""

    def __init__(self, shortest_distance=float("inf"), prev_index=-1):
        self.shortest_distance = float(shortest_distance)
        self.prev_index = int(prev_index)

    def __repr__(self):
        return (f"SSSPResult(dist={self.shortest_distance:.4f}, "
                f"prev={self.prev_index})")


@partial(jax.jit, static_argnames=("n_nodes", "max_iter"))
def _sssp(src: jax.Array, dst: jax.Array, w: jax.Array, start: jax.Array,
          n_nodes: int, max_iter: int):
    """Fixed-point SSSP: dist[v] = min(dist[v], min_e dist[src_e]+w_e)
    via scatter-min (graph.cu relax_functor equivalent). Returns
    (dist [N], prev [N])."""
    inf = jnp.float32(jnp.inf)
    dist0 = jnp.full((n_nodes,), inf).at[start].set(0.0)

    def cond(state):
        it, changed, _ = state
        return (it < max_iter) & changed

    def body(state):
        it, _, dist = state
        cand = dist[src] + w
        new = dist.at[dst].min(cand)
        changed = jnp.any(new < dist)
        return it + 1, changed, new

    _, _, dist = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(True), dist0))

    # predecessor: any edge that achieves the final distance
    cand = dist[src] + w
    achieves = cand == dist[dst]
    big = jnp.int32(np.iinfo(np.int32).max)
    prev = jnp.full((n_nodes,), big, jnp.int32).at[dst].min(
        jnp.where(achieves, src, big))
    prev = jnp.where((prev == big) | ~jnp.isfinite(dist), -1, prev)
    prev = prev.at[start].set(-1)
    return dist, prev


class Graph(LineSet):
    """reference: graph.h:29-128. Edges are directed [E,2] rows of
    ``lines``; undirected graphs (default) store both directions."""

    def __init__(self, points=None, dim: int = 3):
        super().__init__(points=points, dim=dim, gtype=GeometryType.Graph)
        self.edge_weights = jnp.zeros((0,), jnp.float32)
        self.node_colors = jnp.zeros((0, 3), jnp.float32)
        self.is_directed = False

    # -- predicates ---------------------------------------------------------
    def has_weights(self) -> bool:
        return (self.edge_weights.shape[0] > 0
                and self.lines.shape[0] == self.edge_weights.shape[0])

    def has_node_colors(self) -> bool:
        return (self.node_colors.shape[0] > 0
                and self.points.shape[0] == self.node_colors.shape[0])

    def is_constructed(self) -> bool:
        return self.has_weights()

    def clear(self):
        super().clear()
        self.edge_weights = jnp.zeros((0,), jnp.float32)
        self.node_colors = jnp.zeros((0, 3), jnp.float32)
        return self

    def __repr__(self):
        return (f"Graph with {int(self.lines.shape[0])} edges and "
                f"{int(self.points.shape[0])} nodes.")

    # -- construction ---------------------------------------------------------
    def construct_graph(self, set_edge_weights_from_distance: bool = True):
        """reference: Graph::ConstructGraph (graph.cu) — here only the
        weights need materialising (no CSR on TPU)."""
        if set_edge_weights_from_distance or not self.has_weights():
            self.set_edge_weights_from_distance()
        return self

    def set_edge_weights_from_distance(self):
        p = self.points
        li = self.lines
        self.edge_weights = jnp.linalg.norm(p[li[:, 0]] - p[li[:, 1]], axis=-1)
        return self

    def add_edge(self, edge, weight: float = 1.0, lazy_add: bool = False):
        e = np.asarray(edge, np.int32)[None]
        w = np.asarray([weight], np.float32)
        return self.add_edges(e, w, lazy_add)

    def add_edges(self, edges, weights=None, lazy_add: bool = False):
        """reference: Graph::AddEdges (graph.cu:342-383); undirected
        graphs get the reversed copies too."""
        edges = np.asarray(edges, np.int32).reshape(-1, 2)
        if weights is None or len(np.atleast_1d(weights)) == 0:
            weights = np.ones(len(edges), np.float32)
        weights = np.asarray(weights, np.float32)
        if len(weights) != len(edges):
            console.log_error("[AddEdges] edges size is not equal to "
                              "weights size.")
        if not self.is_directed:
            edges = np.concatenate([edges, edges[:, ::-1]], 0)
            weights = np.concatenate([weights, weights], 0)
        self.lines = jnp.concatenate(
            [self.lines, jnp.asarray(edges)], 0)
        self.edge_weights = jnp.concatenate(
            [self.edge_weights, jnp.asarray(weights)], 0)
        if not lazy_add and self.has_weights():
            pass  # no CSR rebuild needed
        return self

    def remove_edge(self, edge):
        return self.remove_edges(np.asarray(edge, np.int32)[None])

    def remove_edges(self, edges):
        """reference: Graph::RemoveEdges (graph.cu:418-470)."""
        edges = np.asarray(edges, np.int32).reshape(-1, 2)
        if not self.is_directed:
            edges = np.concatenate([edges, edges[:, ::-1]], 0)
        lines = np.asarray(self.lines)
        w = np.asarray(self.edge_weights)
        # row-wise membership test
        kill = (lines[:, None, :] == edges[None, :, :]).all(-1).any(-1)
        self.lines = jnp.asarray(lines[~kill])
        if len(w) == len(kill):
            self.edge_weights = jnp.asarray(w[~kill])
        if self.colors.shape[0] == len(kill):
            self.colors = jnp.asarray(np.asarray(self.colors)[~kill])
        return self

    def add_node_and_connect(self, point, max_edge_distance: float = 0.0,
                             lazy_add: bool = False):
        """reference: Graph::AddNodeAndConnect (graph.cu:300-321)."""
        p = np.asarray(point, np.float32)[None]
        n = int(self.points.shape[0])
        d = np.linalg.norm(np.asarray(self.points) - p, axis=-1)
        sel = np.nonzero(d <= max_edge_distance)[0] if max_edge_distance > 0 \
            else np.arange(n)
        self.points = jnp.concatenate(
            [self.points, jnp.asarray(p)], 0)
        if len(sel) > 0:
            edges = np.stack([np.full(len(sel), n), sel], -1)
            self.add_edges(edges, d[sel].astype(np.float32), lazy_add)
        return self

    def connect_to_nearest_neighbors(self, max_edge_distance: float,
                                     max_num_edges: int = 30):
        """reference: Graph::ConnectToNearestNeighbors (graph.cu)."""
        from ..knn import KDTreeSearchParamRadius, search_neighbors

        idx, d2 = search_neighbors(
            self.points, self.points,
            KDTreeSearchParamRadius(max_edge_distance, max_num_edges))
        idx_np = np.asarray(idx)
        n = idx_np.shape[0]
        rows = np.repeat(np.arange(n), idx_np.shape[1])
        cols = idx_np.reshape(-1)
        keep = (cols >= 0) & (cols != rows)
        edges = np.stack([rows[keep], cols[keep]], -1)
        # dedup (u,v)/(v,u): keep u < v, add_edges mirrors them
        uv = np.sort(edges, axis=1)
        uv = np.unique(uv, axis=0)
        if len(uv) > 0:
            w = np.linalg.norm(
                np.asarray(self.points)[uv[:, 0]]
                - np.asarray(self.points)[uv[:, 1]], axis=-1)
            self.add_edges(uv, w.astype(np.float32))
        return self

    def set_edge_weights(self, edges, weight: float):
        """Set the weight of the given (directed) edges
        (reference: Graph::SetEdgeWeights, graph.cu)."""
        edges = np.asarray(edges, np.int32).reshape(-1, 2)
        lines = np.asarray(self.lines)
        w = np.asarray(self.edge_weights).copy()
        hit = (lines[:, None, :] == edges[None, :, :]).all(-1).any(-1)
        w[hit] = weight
        self.edge_weights = jnp.asarray(w)
        return self

    # -- painting -------------------------------------------------------------
    def paint_node_color(self, node: int, color):
        if not self.has_node_colors():
            self.node_colors = jnp.ones((int(self.points.shape[0]), 3),
                                        jnp.float32)
        self.node_colors = self.node_colors.at[node].set(
            jnp.asarray(color, jnp.float32))
        return self

    def paint_nodes_color(self, nodes, color):
        for n in np.asarray(nodes).reshape(-1):
            self.paint_node_color(int(n), color)
        return self

    def paint_edge_color(self, edge, color):
        lines = np.asarray(self.lines)
        e = np.asarray(edge, np.int32)
        hits = (lines == e).all(-1) | (lines == e[::-1]).all(-1)
        if not self.has_colors():
            self.colors = jnp.ones((len(lines), 3), jnp.float32)
        self.colors = jnp.asarray(np.where(
            hits[:, None], np.asarray(color, np.float32), np.asarray(self.colors)))
        return self

    def paint_edges_color(self, edges, color):
        for e in np.asarray(edges).reshape(-1, 2):
            self.paint_edge_color(e, color)
        return self

    # -- shortest paths ---------------------------------------------------------
    def dijkstra_paths(self, start_node_index: int,
                       end_node_index: int = -1) -> List[SSSPResult]:
        """All-node SSSP table (reference: Graph::DijkstraPaths,
        graph.cu:668-727)."""
        if not self.is_constructed():
            self.construct_graph(set_edge_weights_from_distance=not
                                 self.has_weights())
        n = int(self.points.shape[0])
        if self.lines.shape[0] == 0:
            out = [SSSPResult() for _ in range(n)]
            if 0 <= start_node_index < n:
                out[start_node_index] = SSSPResult(0.0, -1)
            return out
        dist, prev = _sssp(
            self.lines[:, 0], self.lines[:, 1], self.edge_weights,
            jnp.int32(start_node_index), n, max_iter=n)
        dist = np.asarray(dist)
        prev = np.asarray(prev)
        return [SSSPResult(d, p) for d, p in zip(dist, prev)]

    def dijkstra_path(self, start_node_index: int,
                      end_node_index: int) -> Tuple[List[int], float]:
        """Path + its length (reference: Graph::DijkstraPath,
        graph.cu:729-757)."""
        res = self.dijkstra_paths(start_node_index, end_node_index)
        dist = res[end_node_index].shortest_distance
        if not np.isfinite(dist):
            return [], float("inf")
        path = [end_node_index]
        node = end_node_index
        while node != start_node_index:
            node = res[node].prev_index
            if node < 0:
                return [], float("inf")
            path.append(node)
        return path[::-1], float(dist)

    @staticmethod
    def create_from_triangle_mesh(mesh) -> "Graph":
        """Graph of the mesh edges (reference: graph.cu
        CreateFromTriangleMesh)."""
        g = Graph(np.asarray(mesh.vertices))
        t = np.asarray(mesh.triangles)
        edges = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]], 0)
        uv = np.unique(np.sort(edges, axis=1), axis=0)
        w = np.linalg.norm(np.asarray(mesh.vertices)[uv[:, 0]]
                           - np.asarray(mesh.vertices)[uv[:, 1]], axis=-1)
        g.add_edges(uv, w.astype(np.float32))
        return g

    @staticmethod
    def create_from_axis_aligned_bounding_box(box, resolutions) -> "Graph":
        """Lattice graph filling an AABB (reference: graph.cu
        CreateFromAxisAlignedBoundingBox)."""
        try:
            min_b = np.asarray(box.min_bound, np.float32)
            max_b = np.asarray(box.max_bound, np.float32)
        except AttributeError:
            min_b, max_b = [np.asarray(b, np.float32) for b in box]
        res = np.asarray(resolutions, np.int64)
        axes = [np.linspace(min_b[i], max_b[i], res[i]) for i in range(3)]
        pts = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
        g = Graph(pts.astype(np.float32))
        nx, ny, nz = res

        def lid(i, j, k):
            return (i * ny + j) * nz + k

        edges = []
        ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                                 indexing="ij")
        base = lid(ii, jj, kk)
        for d, lim in ((lid(ii + 1, jj, kk), ii + 1 < nx),
                       (lid(ii, jj + 1, kk), jj + 1 < ny),
                       (lid(ii, jj, kk + 1), kk + 1 < nz)):
            edges.append(np.stack([base[lim], d[lim]], -1))
        edges = np.concatenate(edges, 0)
        w = np.linalg.norm(pts[edges[:, 0]] - pts[edges[:, 1]], axis=-1)
        g.add_edges(edges, w.astype(np.float32))
        return g
