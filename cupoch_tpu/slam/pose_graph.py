"""Pose graph optimization over a device mesh.

New scope vs the single-GPU reference (SURVEY.md §2.13 / §7.9, the
BASELINE.json north star): the reference has no backend at all; this
module provides the SLAM backend's pose graph. Design: SE(3) keyframe
nodes, relative-pose edges with 6x6 information matrices, Gauss-Newton
with edges **sharded across the mesh** — each device builds the
normal-equation contributions of its edge shard, one `psum` reduces
the sparse-stacked H and b, every device solves the same system and
applies identical updates (so node states stay replicated). The only
per-iteration communication is the reduced normal system.

API shape follows Open3D's `registration.PoseGraph` /
`global_optimization` (the de-facto standard cupoch users pair with
it), since the reference itself defers backend work to Open3D.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utility import console
from ..utility.transforms import exp_se3, inverse_transform, log_se3

EDGE_AXIS = "edges"


class PoseGraphNode:
    def __init__(self, pose=None):
        self.pose = (np.eye(4, dtype=np.float32) if pose is None
                     else np.asarray(pose, np.float32))


class PoseGraphEdge:
    def __init__(self, source_node_id: int, target_node_id: int,
                 transformation=None, information=None,
                 uncertain: bool = False, confidence: float = 1.0):
        self.source_node_id = int(source_node_id)
        self.target_node_id = int(target_node_id)
        self.transformation = (np.eye(4, dtype=np.float32)
                               if transformation is None
                               else np.asarray(transformation, np.float32))
        self.information = (np.eye(6, dtype=np.float32)
                            if information is None
                            else np.asarray(information, np.float32))
        self.uncertain = bool(uncertain)
        self.confidence = float(confidence)


class PoseGraph:
    def __init__(self):
        self.nodes: List[PoseGraphNode] = []
        self.edges: List[PoseGraphEdge] = []


class GlobalOptimizationOption:
    def __init__(self, max_correspondence_distance: float = 0.03,
                 edge_prune_threshold: float = 0.25,
                 preference_loop_closure: float = 1.0,
                 reference_node: int = 0,
                 max_iteration: int = 20):
        self.max_correspondence_distance = float(max_correspondence_distance)
        self.edge_prune_threshold = float(edge_prune_threshold)
        self.preference_loop_closure = float(preference_loop_closure)
        self.reference_node = int(reference_node)
        self.max_iteration = int(max_iteration)


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

def _edge_residual_jacobians(poses, src_idx, tgt_idx, z_inv, info, weight):
    """Residual r = log(Z^-1 T_i^-1 T_j) and its analytic-numeric
    jacobians wrt the left-multiplied twists of nodes i and j.

    Uses the right-trivialised first-order jacobian: for the update
    T_k <- exp(xi_k) T_k, d r / d xi is approximated with identity
    adjoint blocks (Gauss-Newton with chordal-style linearisation),
    which is the standard small-residual approximation for pose-graph
    GN and converges on SLAM-scale rotations.
    """
    Ti = poses[src_idx]      # [E, 4, 4]
    Tj = poses[tgt_idx]

    def residual(xi_i, xi_j, Ti, Tj, z_inv):
        Ti_p = exp_se3(xi_i) @ Ti
        Tj_p = exp_se3(xi_j) @ Tj
        return log_se3(z_inv @ inverse_transform(Ti_p) @ Tj_p)

    zero = jnp.zeros(6)

    def one_edge(Ti, Tj, z_inv):
        r = residual(zero, zero, Ti, Tj, z_inv)
        Ji = jax.jacfwd(residual, argnums=0)(zero, zero, Ti, Tj, z_inv)
        Jj = jax.jacfwd(residual, argnums=1)(zero, zero, Ti, Tj, z_inv)
        return r, Ji, Jj

    r, Ji, Jj = jax.vmap(one_edge)(Ti, Tj, z_inv)
    w = weight[:, None, None] * info
    return r, Ji, Jj, w


def _accumulate_normal_system(poses, src_idx, tgt_idx, z_inv, info, weight,
                              n_nodes: int):
    """Builds the [6N, 6N] H and [6N] b contribution of an edge set."""
    r, Ji, Jj, w = _edge_residual_jacobians(poses, src_idx, tgt_idx, z_inv,
                                            info, weight)
    JiT_w = jnp.einsum("eki,ekl->eil", Ji, w)   # [E, 6, 6] = Ji^T W
    JjT_w = jnp.einsum("eki,ekl->eil", Jj, w)
    H_ii = jnp.einsum("eik,ekj->eij", JiT_w, Ji)
    H_ij = jnp.einsum("eik,ekj->eij", JiT_w, Jj)
    H_jj = jnp.einsum("eik,ekj->eij", JjT_w, Jj)
    b_i = jnp.einsum("eik,ek->ei", JiT_w, r)
    b_j = jnp.einsum("eik,ek->ei", JjT_w, r)

    H = jnp.zeros((n_nodes, 6, n_nodes, 6), jnp.float32)
    b = jnp.zeros((n_nodes, 6), jnp.float32)
    H = H.at[src_idx, :, src_idx, :].add(H_ii)
    H = H.at[src_idx, :, tgt_idx, :].add(H_ij)
    H = H.at[tgt_idx, :, src_idx, :].add(jnp.swapaxes(H_ij, -1, -2))
    H = H.at[tgt_idx, :, tgt_idx, :].add(H_jj)
    b = b.at[src_idx].add(b_i)
    b = b.at[tgt_idx].add(b_j)
    return H.reshape(n_nodes * 6, n_nodes * 6), b.reshape(n_nodes * 6), \
        jnp.sum(jnp.einsum("ek,ekl,el->e", r, w, r))


def _solve_anchored(H, b, lam, n_nodes: int):
    """GN step with node 0 held fixed: solve the reduced system with
    the anchored block eliminated (well-conditioned in float32, unlike
    a big-diagonal clamp) and re-insert zeros for the anchor."""
    Hr = H[6:, 6:] + lam * jnp.eye((n_nodes - 1) * 6)
    br = b[6:]
    dxr = -jnp.linalg.solve(Hr, br)
    return jnp.concatenate([jnp.zeros(6), dxr]).reshape(n_nodes, 6)


@partial(jax.jit, static_argnames=("n_nodes", "max_iteration"))
def _optimize_replicated(poses, src_idx, tgt_idx, z_inv, info, weight,
                         n_nodes: int, max_iteration: int, lam):
    """Single-device GN loop (used when no mesh is given)."""

    def body(_, state):
        poses, _ = state
        H, b, err = _accumulate_normal_system(
            poses, src_idx, tgt_idx, z_inv, info, weight, n_nodes)
        dx = _solve_anchored(H, b, lam, n_nodes)
        new_poses = jnp.einsum(
            "nij,njk->nik", jax.vmap(exp_se3)(dx), poses)
        return new_poses, err

    poses, err = jax.lax.fori_loop(0, max_iteration, body,
                                   (poses, jnp.float32(0.0)))
    return poses, err


def _optimize_sharded(mesh: Mesh, poses, edges_arrays, n_nodes: int,
                      max_iteration: int, lam):
    """Edge-sharded GN: per-device partial (H, b) + one psum, identical
    replicated solve (the distributed Schur-style reduction of §7.9)."""
    src_idx, tgt_idx, z_inv, info, weight = edges_arrays

    def local(poses, src_idx, tgt_idx, z_inv, info, weight):
        def body(_, state):
            poses, _ = state
            H, b, err = _accumulate_normal_system(
                poses, src_idx, tgt_idx, z_inv, info, weight, n_nodes)
            H = jax.lax.psum(H, EDGE_AXIS)
            b = jax.lax.psum(b, EDGE_AXIS)
            err = jax.lax.psum(err, EDGE_AXIS)
            dx = _solve_anchored(H, b, lam, n_nodes)
            new_poses = jnp.einsum(
                "nij,njk->nik", jax.vmap(exp_se3)(dx), poses)
            return new_poses, err

        return jax.lax.fori_loop(0, max_iteration, body,
                                 (poses, jnp.float32(0.0)))

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS),
                  P(EDGE_AXIS), P(EDGE_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    ns = NamedSharding(mesh, P(EDGE_AXIS))
    src_idx = jax.device_put(src_idx, ns)
    tgt_idx = jax.device_put(tgt_idx, ns)
    z_inv = jax.device_put(z_inv, ns)
    info = jax.device_put(info, ns)
    weight = jax.device_put(weight, ns)
    return fn(poses, src_idx, tgt_idx, z_inv, info, weight)


def global_optimization(pose_graph: PoseGraph,
                        option: Optional[GlobalOptimizationOption] = None,
                        mesh: Optional[Mesh] = None) -> PoseGraph:
    """Optimizes node poses in place and returns the graph.

    With `mesh`, edges are padded to a device multiple and sharded on
    the mesh's first axis; without, the same kernel runs single-device.
    """
    option = option or GlobalOptimizationOption()
    n_nodes = len(pose_graph.nodes)
    n_edges = len(pose_graph.edges)
    if n_nodes == 0 or n_edges == 0:
        console.log_warning("[GlobalOptimization] empty pose graph.")
        return pose_graph

    poses = jnp.asarray(
        np.stack([n.pose for n in pose_graph.nodes]), jnp.float32)
    src = np.asarray([e.source_node_id for e in pose_graph.edges], np.int32)
    tgt = np.asarray([e.target_node_id for e in pose_graph.edges], np.int32)
    z = np.stack([e.transformation for e in pose_graph.edges])
    info = np.stack([e.information for e in pose_graph.edges])
    weight = np.asarray(
        [option.preference_loop_closure if e.uncertain else 1.0
         for e in pose_graph.edges], np.float32)
    z_inv = np.linalg.inv(z).astype(np.float32)

    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        pad = (-n_edges) % n_dev
        if pad:
            # padded edges self-connect node 0 with zero weight
            src = np.concatenate([src, np.zeros(pad, np.int32)])
            tgt = np.concatenate([tgt, np.zeros(pad, np.int32)])
            z_inv = np.concatenate(
                [z_inv, np.tile(np.eye(4, dtype=np.float32),
                                (pad, 1, 1))])
            info = np.concatenate(
                [info, np.tile(np.eye(6, dtype=np.float32), (pad, 1, 1))])
            weight = np.concatenate([weight, np.zeros(pad, np.float32)])
        new_poses, err = _optimize_sharded(
            mesh, poses, (jnp.asarray(src), jnp.asarray(tgt),
                          jnp.asarray(z_inv), jnp.asarray(info),
                          jnp.asarray(weight)),
            n_nodes, option.max_iteration, jnp.float32(1e-6))
    else:
        new_poses, err = _optimize_replicated(
            poses, jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(z_inv),
            jnp.asarray(info), jnp.asarray(weight), n_nodes,
            option.max_iteration, jnp.float32(1e-6))

    new_poses = np.asarray(new_poses)
    console.log_debug("[GlobalOptimization] residual %g", float(err))
    for i, node in enumerate(pose_graph.nodes):
        node.pose = new_poses[i]
    return pose_graph
