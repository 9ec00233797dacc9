"""Pairwise intersection queries between voxel grids, occupancy grids,
line sets, and primitives.

reference: src/cupoch/collision/collision.{h,cu}. The reference builds
an LBVH over the target's AABBs and walks it per query
(collision.cu:21-201); pointer-chasing BVH traversal is hostile to the
TPU, so the broad phase here is a tiled dense all-pairs AABB overlap —
a [tile, M] branch-free compare that the VPU eats — with exact
narrow-phase tests (segment/AABB slab test, primitive inside-tests)
fused into the same kernel.
"""
from __future__ import annotations

import enum
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.intersection_test import line_segment_aabb
from ..geometry.lineset import LineSet
from ..geometry.occupancygrid import OccupancyGrid
from ..geometry.voxelgrid import VoxelGrid
from ..utility import console
from .primitives import Primitive


class CollisionType(enum.IntEnum):
    # values match collision.h:40-46
    Unspecified = 0
    Primitives = 1
    VoxelGrid = 2
    OccupancyGrid = 3
    LineSet = 4


class CollisionResult:
    """reference: collision.h:39-66."""

    def __init__(self, first=CollisionType.Unspecified,
                 second=CollisionType.Unspecified, index_pairs=None):
        self.first = first
        self.second = second
        self.collision_index_pairs = (
            np.zeros((0, 2), np.int32) if index_pairs is None
            else np.asarray(index_pairs, np.int32))
        self.n_dropped = 0  # bucket broad-phase capacity overflows

    def is_collided(self) -> bool:
        return len(self.collision_index_pairs) > 0

    def get_collision_index_pairs(self) -> np.ndarray:
        return self.collision_index_pairs

    def get_first_collision_indices(self) -> np.ndarray:
        return np.unique(self.collision_index_pairs[:, 0])

    def get_second_collision_indices(self) -> np.ndarray:
        return np.unique(self.collision_index_pairs[:, 1])

    def __repr__(self):
        return (f"CollisionResult ({self.first.name} vs {self.second.name}) "
                f"with {len(self.collision_index_pairs)} pairs.")


# ---------------------------------------------------------------------------
# dense pair kernels
# ---------------------------------------------------------------------------

_TILE = 1024
_DENSE_LIMIT = 16_000_000   # N*M above this -> bucket broad phase
_MAX_PAIRS_PER_QUERY = 32


@partial(jax.jit, static_argnames=())
def _aabb_overlap_pairs(lo1, hi1, lo2, hi2, margin):
    """[N,M] overlap matrix of two AABB sets, margin-inflated."""
    m = jnp.asarray(margin, jnp.float32)
    return jnp.all((lo1[:, None, :] <= hi2[None, :, :] + m)
                   & (lo2[None, :, :] <= hi1[:, None, :] + m), -1)


def _pairs_from_matrix(mat: jax.Array) -> np.ndarray:
    return np.argwhere(np.asarray(mat)).astype(np.int32)


# ---------------------------------------------------------------------------
# bucket broad phase (reference: the LBVH over target AABBs,
# collision.cu:21-22 + third_party/lbvh; pointer-chasing traversal is
# hostile to the TPU, so the same O(N log M) -> O(N) effect comes from
# a 27-run uniform bucket grid — the machinery the ICP grids use)
# ---------------------------------------------------------------------------

def _bucket_overlap_pairs(lo1, hi1, lo2, hi2, margin: float,
                          max_pairs: int = _MAX_PAIRS_PER_QUERY):
    """Scalable AABB-set overlap: bin set-2 boxes by center into a
    uniform grid whose cell exceeds (ext1+ext2)/2+margin, so overlap
    candidates lie in the 27-neighborhood of each set-1 box's cell.
    Returns (pairs [K, 2] int32, n_dropped) — up to `max_pairs` hits
    per set-1 box (uniform-voxel workloads cap at 27)."""
    from ..knn.poolgrid import _bin_to_slots

    lo1n = np.asarray(lo1)
    hi1n = np.asarray(hi1)
    lo2n = np.asarray(lo2)
    hi2n = np.asarray(hi2)
    c1 = (lo1n + hi1n) * 0.5
    c2 = (lo2n + hi2n) * 0.5
    e1 = float((hi1n - lo1n).max()) if len(lo1n) else 0.0
    e2 = float((hi2n - lo2n).max()) if len(lo2n) else 0.0
    h = (e1 + e2) * 0.5 + float(margin) + 1e-6
    gmin = np.minimum(c1.min(0), c2.min(0)) - 2 * h
    gmax = np.maximum(c1.max(0), c2.max(0)) + 2 * h
    dims = np.maximum(np.ceil((gmax - gmin) / h).astype(int) + 1, 1)
    C = int(np.prod(dims))
    if C > 4_000_000:
        return None  # degenerate spread; caller falls back to dense

    def lin_cells(c):
        ci = np.floor((c - gmin) / h).astype(np.int64)
        return (ci[:, 0] * dims[1] + ci[:, 1]) * dims[2] + ci[:, 2]

    l2 = lin_cells(c2)
    counts = np.bincount(l2, minlength=C)
    cap = max(8, int(-(-int(np.percentile(counts[counts > 0], 99.9))
                       // 8) * 8)) if counts.any() else 8
    key2 = jnp.asarray(l2 * 64, jnp.int32)
    ch2 = [jnp.asarray(lo2n[:, i], jnp.float32) for i in range(3)] + \
        [jnp.asarray(hi2n[:, i], jnp.float32) for i in range(3)]
    binned2, index2, drop2 = _bin_to_slots(
        key2, C, cap, ch2, [jnp.float32(np.inf)] * 3
        + [jnp.float32(-np.inf)] * 3)

    l1 = lin_cells(c1)
    q_counts = np.bincount(l1, minlength=C)
    qcap = max(8, int(-(-int(np.percentile(
        q_counts[q_counts > 0], 99.9)) // 8) * 8)) \
        if q_counts.any() else 8
    key1 = jnp.asarray(l1 * 64, jnp.int32)
    ch1 = [jnp.asarray(lo1n[:, i], jnp.float32) for i in range(3)] + \
        [jnp.asarray(hi1n[:, i], jnp.float32) for i in range(3)]
    binned1, index1, drop1 = _bin_to_slots(
        key1, C, qcap, ch1, [jnp.float32(np.inf)] * 3
        + [jnp.float32(-np.inf)] * 3)

    dims_t = tuple(int(d) for d in dims)
    pairs_i1, pairs_i2 = _bucket_pairs_device(
        tuple(binned2), index2, tuple(binned1), index1,
        jnp.float32(margin), dims_t, int(cap), int(qcap),
        int(max_pairs))
    p1 = np.asarray(pairs_i1).reshape(-1)
    p2 = np.asarray(pairs_i2).reshape(-1)
    okp = (p1 >= 0) & (p2 >= 0)
    pairs = np.stack([p1[okp], p2[okp]], -1).astype(np.int32)
    return pairs, int(drop1) + int(drop2)


@partial(jax.jit, static_argnames=("dims", "cap", "qcap", "max_pairs"))
def _bucket_pairs_device(binned2, index2, binned1, index1, margin,
                         dims, cap: int, qcap: int, max_pairs: int):
    """27-run roll assembly + per-(query, lane) AABB test + top-k pair
    extraction, tiled over cells to bound memory."""
    Gx, Gy, Gz = dims
    C = Gx * Gy * Gz

    def rolled(arr2d):
        a = arr2d.reshape(Gx, Gy, Gz, cap)
        parts = []
        for (dx, dy, dz) in RUN_OFFSETS_:
            r = jnp.roll(a, (-dx, -dy, -dz), (0, 1, 2)).reshape(C, cap)
            parts.append(r)
        return jnp.concatenate(parts, -1)

    lo2r = [rolled(binned2[i]) for i in range(3)]
    hi2r = [rolled(binned2[3 + i]) for i in range(3)]
    idx2r = rolled(index2.astype(jnp.float32))
    KC = 27 * cap

    T = 8
    cp = -(-C // T) * T
    padc = cp - C

    def padrows(a, v):
        return jnp.pad(a, ((0, padc), (0, 0)), constant_values=v)

    lo2r = [padrows(a, np.inf) for a in lo2r]
    hi2r = [padrows(a, -np.inf) for a in hi2r]
    idx2r = padrows(idx2r, -1.0)
    b1 = [padrows(binned1[i], np.inf) for i in range(3)] + \
        [padrows(binned1[3 + i], -np.inf) for i in range(3)]
    i1 = padrows(index1.astype(jnp.float32), -1.0)

    def body(args):
        q_lo_hi, qi, c_lo, c_hi, ci = args
        qlo = jnp.stack(q_lo_hi[0:3], -1)       # [T, qcap, 3]
        qhi = jnp.stack(q_lo_hi[3:6], -1)
        clo = jnp.stack(c_lo, -1)               # [T, KC, 3]
        chi = jnp.stack(c_hi, -1)
        m = margin
        hit = jnp.all(
            (qlo[:, :, None, :] <= chi[:, None, :, :] + m)
            & (clo[:, None, :, :] <= qhi[:, :, None, :] + m), -1)
        hit = hit & (qi[:, :, None] >= 0) & (ci[:, None, :] >= 0)
        # up to max_pairs hits per query: top_k on hit-masked lane ids
        score = jnp.where(hit, 1.0, 0.0) * (KC - jnp.arange(
            KC, dtype=jnp.float32))[None, None, :]
        vals, lanes = jax.lax.top_k(score, max_pairs)
        got = vals > 0.0
        hidx = jnp.take_along_axis(
            jnp.broadcast_to(ci[:, None, :],
                             (T, qcap, KC)), lanes, -1)
        out1 = jnp.where(got, qi[:, :, None],
                         -1.0 * jnp.ones_like(vals))
        out2 = jnp.where(got, hidx, -1.0)
        return out1, out2

    n = cp // T
    args = (
        tuple(b.reshape(n, T, qcap) for b in b1),
        i1.reshape(n, T, qcap),
        tuple(a.reshape(n, T, KC) for a in lo2r),
        tuple(a.reshape(n, T, KC) for a in hi2r),
        idx2r.reshape(n, T, KC))
    o1, o2 = jax.lax.map(body, args)
    return o1.astype(jnp.int32), o2.astype(jnp.int32)


RUN_OFFSETS_ = tuple(sorted(
    ((dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
     for dz in (-1, 0, 1)),
    key=lambda o: (o[0] * o[0] + o[1] * o[1] + o[2] * o[2],) + o))


def _voxel_aabbs(vg: VoxelGrid):
    lo = (jnp.asarray(vg.origin)
          + vg.voxels_keys.astype(jnp.float32) * vg.voxel_size)
    return lo, lo + vg.voxel_size


def _occ_aabbs(og: OccupancyGrid):
    idx, _, _ = og.extract_occupied_voxels()
    half = og.resolution // 2
    lo = (jnp.asarray(og.origin)
          + (jnp.asarray(idx, jnp.float32) - half) * og.voxel_size)
    return lo, lo + og.voxel_size, idx


def _flat_occ_index(og: OccupancyGrid, idx: np.ndarray) -> np.ndarray:
    R = og.resolution
    return (idx[:, 0] * R + idx[:, 1]) * R + idx[:, 2]


# ---------------------------------------------------------------------------
# typed intersections (reference: 12 ComputeIntersection overloads,
# collision.h:88-143)
# ---------------------------------------------------------------------------

def _voxel_voxel(vg1: VoxelGrid, vg2: VoxelGrid, margin: float):
    lo1, hi1 = _voxel_aabbs(vg1)
    lo2, hi2 = _voxel_aabbs(vg2)
    n, m = lo1.shape[0], lo2.shape[0]
    if n * m > _DENSE_LIMIT:
        got = _bucket_overlap_pairs(lo1, hi1, lo2, hi2, margin)
        if got is not None:
            pairs, dropped = got
            res = CollisionResult(CollisionType.VoxelGrid,
                                  CollisionType.VoxelGrid, pairs)
            res.n_dropped = dropped
            if dropped:
                console.log_warning(
                    "[ComputeIntersection] bucket broad phase dropped "
                    f"{dropped} overflowing boxes")
            return res
    mat = _aabb_overlap_pairs(lo1, hi1, lo2, hi2, margin)
    return CollisionResult(CollisionType.VoxelGrid, CollisionType.VoxelGrid,
                           _pairs_from_matrix(mat))


@jax.jit
def _segment_box_pairs(lo, hi, p0, p1, margin):
    """[N_box, N_seg] overlap of boxes (inflated) with segments."""
    m = jnp.asarray(margin, jnp.float32)
    return line_segment_aabb(p0[None, :, :], p1[None, :, :],
                             (lo - m)[:, None, :], (hi + m)[:, None, :])


def _voxel_lineset(vg: VoxelGrid, ls: LineSet, margin: float, swap: bool):
    lo, hi = _voxel_aabbs(vg)
    p0 = ls.points[ls.lines[:, 0]]
    p1 = ls.points[ls.lines[:, 1]]
    mat = _segment_box_pairs(lo, hi, p0, p1, margin)
    pairs = _pairs_from_matrix(mat)
    if swap:
        return CollisionResult(CollisionType.LineSet, CollisionType.VoxelGrid,
                               pairs[:, ::-1])
    return CollisionResult(CollisionType.VoxelGrid, CollisionType.LineSet,
                           pairs)


def _occgrid_lineset(og: OccupancyGrid, ls: LineSet, margin: float,
                     swap: bool):
    lo, hi, idx = _occ_aabbs(og)
    p0 = ls.points[ls.lines[:, 0]]
    p1 = ls.points[ls.lines[:, 1]]
    mat = _segment_box_pairs(lo, hi, p0, p1, margin)
    pairs = _pairs_from_matrix(mat)
    flat = _flat_occ_index(og, np.asarray(idx))
    pairs[:, 0] = flat[pairs[:, 0]]
    if swap:
        return CollisionResult(CollisionType.LineSet,
                               CollisionType.OccupancyGrid, pairs[:, ::-1])
    return CollisionResult(CollisionType.OccupancyGrid, CollisionType.LineSet,
                           pairs)


def _voxel_occgrid(vg: VoxelGrid, og: OccupancyGrid, margin: float,
                   swap: bool):
    lo1, hi1 = _voxel_aabbs(vg)
    lo2, hi2, idx = _occ_aabbs(og)
    if lo1.shape[0] * lo2.shape[0] > _DENSE_LIMIT:
        got = _bucket_overlap_pairs(lo1, hi1, lo2, hi2, margin)
    else:
        got = None
    if got is not None:
        pairs, dropped = got
    else:
        dropped = 0
        mat = _aabb_overlap_pairs(lo1, hi1, lo2, hi2, margin)
        pairs = _pairs_from_matrix(mat)
    flat = _flat_occ_index(og, np.asarray(idx))
    pairs[:, 1] = flat[pairs[:, 1]]
    if swap:
        res = CollisionResult(CollisionType.OccupancyGrid,
                              CollisionType.VoxelGrid, pairs[:, ::-1])
    else:
        res = CollisionResult(CollisionType.VoxelGrid,
                              CollisionType.OccupancyGrid, pairs)
    res.n_dropped = dropped
    return res


def _primitives_voxels(prims: List[Primitive], vg: VoxelGrid, margin: float,
                       swap: bool):
    """Exact primitive-vs-voxel-center containment with half-diagonal
    inflation (conservative like the reference's per-type functors,
    collision.cu:36-201)."""
    centers = np.asarray(vg.get_voxel_centers())
    inflate = margin + vg.voxel_size * np.sqrt(3.0) / 2.0
    pairs = []
    for i, p in enumerate(prims):
        hit = np.nonzero(p._contains(centers, margin=inflate))[0]
        pairs.append(np.stack(
            [np.full(len(hit), i, np.int32), hit.astype(np.int32)], -1))
    pairs = (np.concatenate(pairs, 0) if pairs
             else np.zeros((0, 2), np.int32))
    if swap:
        return CollisionResult(CollisionType.VoxelGrid,
                               CollisionType.Primitives, pairs[:, ::-1])
    return CollisionResult(CollisionType.Primitives, CollisionType.VoxelGrid,
                           pairs)


def _primitives_occgrid(prims: List[Primitive], og: OccupancyGrid,
                        margin: float, swap: bool):
    lo, hi, idx = _occ_aabbs(og)
    idx = np.asarray(idx)
    half = og.resolution // 2
    centers = (np.asarray(og.origin)
               + (idx.astype(np.float32) - half + 0.5) * og.voxel_size)
    inflate = margin + og.voxel_size * np.sqrt(3.0) / 2.0
    flat = _flat_occ_index(og, idx)
    pairs = []
    for i, p in enumerate(prims):
        hit = np.nonzero(p._contains(centers, margin=inflate))[0]
        pairs.append(np.stack(
            [np.full(len(hit), i, np.int32), flat[hit].astype(np.int32)], -1))
    pairs = (np.concatenate(pairs, 0) if pairs
             else np.zeros((0, 2), np.int32))
    if swap:
        return CollisionResult(CollisionType.OccupancyGrid,
                               CollisionType.Primitives, pairs[:, ::-1])
    return CollisionResult(CollisionType.Primitives,
                           CollisionType.OccupancyGrid, pairs)


def _primitives_primitives(p1: List[Primitive], p2: List[Primitive],
                           margin: float):
    lo1, hi1, lo2, hi2 = [], [], [], []
    for p in p1:
        lo, hi = p._aabb_bounds()
        lo1.append(lo)
        hi1.append(hi)
    for p in p2:
        lo, hi = p._aabb_bounds()
        lo2.append(lo)
        hi2.append(hi)
    mat = _aabb_overlap_pairs(
        jnp.asarray(np.stack(lo1)), jnp.asarray(np.stack(hi1)),
        jnp.asarray(np.stack(lo2)), jnp.asarray(np.stack(hi2)), margin)
    return CollisionResult(CollisionType.Primitives, CollisionType.Primitives,
                           _pairs_from_matrix(mat))


def compute_intersection(obj1, obj2, margin: float = 0.0) -> CollisionResult:
    """Type-dispatching intersection (reference: the ComputeIntersection
    overload set, collision.h:88-143)."""
    def is_prims(o):
        return (isinstance(o, Primitive)
                or (isinstance(o, (list, tuple))
                    and all(isinstance(p, Primitive) for p in o)))

    def as_prims(o):
        return [o] if isinstance(o, Primitive) else list(o)

    if isinstance(obj1, VoxelGrid) and isinstance(obj2, VoxelGrid):
        return _voxel_voxel(obj1, obj2, margin)
    if isinstance(obj1, VoxelGrid) and isinstance(obj2, LineSet):
        return _voxel_lineset(obj1, obj2, margin, swap=False)
    if isinstance(obj1, LineSet) and isinstance(obj2, VoxelGrid):
        return _voxel_lineset(obj2, obj1, margin, swap=True)
    if isinstance(obj1, VoxelGrid) and isinstance(obj2, OccupancyGrid):
        return _voxel_occgrid(obj1, obj2, margin, swap=False)
    if isinstance(obj1, OccupancyGrid) and isinstance(obj2, VoxelGrid):
        return _voxel_occgrid(obj2, obj1, margin, swap=True)
    if isinstance(obj1, OccupancyGrid) and isinstance(obj2, LineSet):
        return _occgrid_lineset(obj1, obj2, margin, swap=False)
    if isinstance(obj1, LineSet) and isinstance(obj2, OccupancyGrid):
        return _occgrid_lineset(obj2, obj1, margin, swap=True)
    if is_prims(obj1) and isinstance(obj2, VoxelGrid):
        return _primitives_voxels(as_prims(obj1), obj2, margin, swap=False)
    if isinstance(obj1, VoxelGrid) and is_prims(obj2):
        return _primitives_voxels(as_prims(obj2), obj1, margin, swap=True)
    if is_prims(obj1) and isinstance(obj2, OccupancyGrid):
        return _primitives_occgrid(as_prims(obj1), obj2, margin, swap=False)
    if isinstance(obj1, OccupancyGrid) and is_prims(obj2):
        return _primitives_occgrid(as_prims(obj2), obj1, margin, swap=True)
    if is_prims(obj1) and is_prims(obj2):
        return _primitives_primitives(as_prims(obj1), as_prims(obj2), margin)
    console.log_error("[ComputeIntersection] unsupported type pair "
                      f"({type(obj1).__name__}, {type(obj2).__name__}).")
