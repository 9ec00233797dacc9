"""Dense probabilistic occupancy grid.

reference: src/cupoch/geometry/occupancygrid.{h,cu} +
densegrid.{h,inl}. The reference stores resolution^3 OccupancyVoxel
structs and, per Insert, runs a 3D-DDA ray walk per point followed by
sort/unique/set_difference compaction (occupancygrid.cu:67-96,163-192).
The TPU design replaces the dynamic voxel lists with fixed-shape grid
masks: the DDA runs as a `lax.while_loop` vmapped over all rays that
scatter-marks a boolean "free" grid (scatter of True is idempotent, so
no dedup pass is needed — one log-odds update per voxel per insert is
preserved by construction), and the log-odds update is one fused
masked elementwise pass over the dense grid.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utility import console
from .geometry import Geometry3D, GeometryType


class OccupancyVoxel:
    """reference: occupancygrid.h:30-50."""

    def __init__(self, grid_index=(0, 0, 0), prob_log=float("nan"),
                 color=(0.0, 0.0, 1.0)):
        self.grid_index = np.asarray(grid_index, np.int32)
        self.prob_log = float(prob_log)
        self.color = np.asarray(color, np.float32)

    def __repr__(self):
        return (f"OccupancyVoxel(grid_index={tuple(self.grid_index)}, "
                f"prob_log={self.prob_log:.3f})")


@partial(jax.jit, static_argnames=("resolution", "max_steps"))
def _dda_free_mask(points: jax.Array, viewpoint: jax.Array,
                   voxel_size, origin: jax.Array,
                   resolution: int, max_steps: int) -> jax.Array:
    """Boolean [R,R,R] mask of voxels crossed by the viewpoint->point
    rays (reference: VoxelTraversal, occupancygrid.cu:61-127). All rays
    step in lockstep inside one while_loop; finished rays scatter to a
    dropped out-of-range index."""
    R = resolution
    half = R // 2
    start = (viewpoint - origin) / voxel_size          # grid units
    end = (points - origin) / voxel_size               # [N,3]
    ray = end - start[None]
    length = jnp.linalg.norm(ray, axis=-1, keepdims=True)
    dirn = ray / jnp.maximum(length, 1e-20)
    degenerate = length[:, 0] == 0.0

    current = jnp.floor(start)[None].repeat(points.shape[0], 0)
    last = jnp.floor(end)
    step = jnp.sign(dirn)
    inf = jnp.float32(jnp.inf)
    boundary = (current + 0.5 * step + 0.5)            # next crossing plane
    tmax = jnp.where(step != 0, (boundary - start[None]) / dirn, inf)
    tdelta = jnp.where(step != 0, 1.0 / jnp.abs(dirn), inf)

    free0 = jnp.zeros((R * R * R,), jnp.bool_)

    def flat_idx(cur):
        v = cur.astype(jnp.int32) + half
        ok = jnp.all((v >= 0) & (v < R), -1)
        f = (v[:, 0] * R + v[:, 1]) * R + v[:, 2]
        return jnp.where(ok, f, R * R * R)             # dropped when OOB

    def cond(state):
        it, _, _, _, done = state
        return (it < max_steps) & ~jnp.all(done)

    def body(state):
        it, free, current, tmax, done = state
        f = jnp.where(done, R * R * R, flat_idx(current))
        free = free.at[f].set(True, mode="drop")
        done = done | jnp.all(current == last, -1)
        axis = jnp.argmin(tmax, -1)
        onehot = jax.nn.one_hot(axis, 3, dtype=current.dtype)
        current = current + onehot * step
        tmax = tmax + onehot * tdelta
        return it + 1, free, current, tmax, done

    state = (jnp.int32(0), free0, current, tmax, degenerate)
    _, free, _, _, _ = jax.lax.while_loop(cond, body, state)
    return free.reshape(R, R, R)


@partial(jax.jit, static_argnames=("resolution",))
def _occupied_mask(points: jax.Array, hit: jax.Array, voxel_size,
                   origin: jax.Array, resolution: int) -> jax.Array:
    """[R,R,R] mask of endpoint voxels (reference:
    create_occupancy_voxels_functor, occupancygrid.cu:194-219)."""
    R = resolution
    half = R // 2
    v = jnp.floor((points - origin) / voxel_size).astype(jnp.int32) + half
    ok = hit & jnp.all((v >= 0) & (v < R), -1)
    f = (v[:, 0] * R + v[:, 1]) * R + v[:, 2]
    f = jnp.where(ok, f, R * R * R)
    occ = jnp.zeros((R * R * R,), jnp.bool_).at[f].set(True, mode="drop")
    return occ.reshape(R, R, R)


@jax.jit
def _apply_log_odds(prob_log, free, occ, prob_miss_log, prob_hit_log,
                    cmin, cmax):
    """One log-odds update per touched voxel
    (reference: add_occupancy_functor, occupancygrid.cu:248-282)."""
    free = free & ~occ
    touched = free | occ
    p = jnp.where(jnp.isnan(prob_log), 0.0, prob_log)
    p = p + jnp.where(occ, prob_hit_log, 0.0) + jnp.where(
        free, prob_miss_log, 0.0)
    p = jnp.clip(p, cmin, cmax)
    return jnp.where(touched, p, prob_log), touched


class OccupancyGrid(Geometry3D):
    """Dense [R,R,R] log-odds grid centered on ``origin``
    (reference: occupancygrid.h:71-141; same defaults)."""

    def __init__(self, voxel_size: float = 0.05, resolution: int = 512,
                 origin=(0.0, 0.0, 0.0)):
        super().__init__(GeometryType.OccupancyGrid)
        self.voxel_size = float(voxel_size)
        self.resolution = int(resolution)
        self.origin = np.asarray(origin, np.float32)
        self.prob_log = jnp.full(
            (self.resolution,) * 3, jnp.nan, jnp.float32)
        self.clamping_thres_min = -2.0
        self.clamping_thres_max = 3.5
        self.prob_hit_log = 0.85
        self.prob_miss_log = -0.4
        self.occ_prob_thres_log = 0.0
        self.visualize_free_area = True
        half = self.resolution // 2
        self.min_bound = np.full(3, half, np.int32)
        self.max_bound = np.full(3, half, np.int32)

    # -- basics -----------------------------------------------------------
    def clear(self):
        self.prob_log = jnp.full((self.resolution,) * 3, jnp.nan, jnp.float32)
        half = self.resolution // 2
        self.min_bound = np.full(3, half, np.int32)
        self.max_bound = np.full(3, half, np.int32)
        return self

    def is_empty(self) -> bool:
        return not bool(jnp.any(~jnp.isnan(self.prob_log)))

    def __repr__(self):
        return (f"OccupancyGrid with resolution {self.resolution}, "
                f"voxel_size {self.voxel_size}")

    def has_voxels(self) -> bool:
        return not self.is_empty()

    def get_min_bound(self) -> np.ndarray:
        half = self.resolution // 2
        return self.origin + (self.min_bound.astype(np.float32) - half) \
            * self.voxel_size

    def get_max_bound(self) -> np.ndarray:
        half = self.resolution // 2
        return self.origin + (self.max_bound.astype(np.float32) + 1 - half) \
            * self.voxel_size

    def _primary_points(self):
        idx, _, _ = self.extract_known_voxels()
        half = self.resolution // 2
        return (jnp.asarray(self.origin)
                + (jnp.asarray(idx, jnp.float32) - half + 0.5) * self.voxel_size)

    # -- point queries (occupancygrid.cu GetVoxel/IsOccupied) --------------
    def _index_of(self, point) -> np.ndarray:
        half = self.resolution // 2
        return np.floor((np.asarray(point, np.float32) - self.origin)
                        / self.voxel_size).astype(np.int32) + half

    def get_voxel(self, point) -> Tuple[bool, OccupancyVoxel]:
        idx = self._index_of(point)
        R = self.resolution
        if np.any(idx < 0) or np.any(idx >= R):
            return False, OccupancyVoxel()
        p = float(self.prob_log[idx[0], idx[1], idx[2]])
        return True, OccupancyVoxel(idx, p)

    def is_occupied(self, point) -> bool:
        ok, v = self.get_voxel(point)
        return bool(ok and not np.isnan(v.prob_log)
                    and v.prob_log > self.occ_prob_thres_log)

    def is_unknown(self, point) -> bool:
        ok, v = self.get_voxel(point)
        return (not ok) or bool(np.isnan(v.prob_log))

    # -- extraction (occupancygrid.cu ExtractBoundVoxels) -------------------
    def _extract(self, predicate) -> Tuple[np.ndarray, np.ndarray, None]:
        lo = self.min_bound
        hi = self.max_bound + 1
        sub = np.asarray(self.prob_log[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]])
        mask = predicate(sub) & ~np.isnan(sub)
        idx = np.argwhere(mask).astype(np.int32) + lo
        return idx, sub[mask], None

    def extract_known_voxels(self):
        return self._extract(lambda p: np.ones_like(p, bool))

    def extract_free_voxels(self):
        return self._extract(lambda p: p <= self.occ_prob_thres_log)

    def extract_occupied_voxels(self):
        return self._extract(lambda p: p > self.occ_prob_thres_log)

    # -- updates ------------------------------------------------------------
    def _update_bounds(self, touched):
        any_x = np.asarray(jnp.any(touched, (1, 2)))
        any_y = np.asarray(jnp.any(touched, (0, 2)))
        any_z = np.asarray(jnp.any(touched, (0, 1)))
        if any_x.any():
            self.min_bound = np.minimum(self.min_bound, np.asarray(
                [any_x.argmax(), any_y.argmax(), any_z.argmax()], np.int32))
            R = self.resolution
            self.max_bound = np.maximum(self.max_bound, np.asarray(
                [R - 1 - any_x[::-1].argmax(), R - 1 - any_y[::-1].argmax(),
                 R - 1 - any_z[::-1].argmax()], np.int32))

    def insert(self, points, viewpoint, max_range: float = -1.0):
        """Insert a scan: DDA free-space update + endpoint hits
        (reference: OccupancyGrid::Insert, occupancygrid.cu:463-507)."""
        pts = getattr(points, "points", points)
        pts = jnp.asarray(pts, jnp.float32)
        if pts.shape[0] == 0:
            return self
        vp = jnp.asarray(viewpoint, jnp.float32)
        pt_vp = pts - vp
        dist = jnp.linalg.norm(pt_vp, axis=-1)
        is_hit = (max_range < 0) | (dist <= max_range)
        safe = jnp.maximum(dist, 1e-20)[:, None]
        ranged = jnp.where(is_hit[:, None], pts,
                           vp + pt_vp / safe * jnp.float32(max_range))
        max_dist = float(jnp.max(jnp.max(jnp.abs(ranged - vp), -1)))
        n_div = int(np.ceil(max_dist / self.voxel_size))
        origin = jnp.asarray(self.origin)

        occ = _occupied_mask(ranged, is_hit, jnp.float32(self.voxel_size),
                             origin, self.resolution)
        if n_div > 0:
            free = _dda_free_mask(
                ranged, vp, jnp.float32(self.voxel_size), origin,
                self.resolution, max_steps=3 * (n_div + 1))
        else:
            free = jnp.zeros_like(occ)
        self.prob_log, touched = _apply_log_odds(
            self.prob_log, free, occ,
            jnp.float32(self.prob_miss_log), jnp.float32(self.prob_hit_log),
            jnp.float32(self.clamping_thres_min),
            jnp.float32(self.clamping_thres_max))
        self._update_bounds(touched)
        return self

    def add_voxel(self, voxel_index, occupied: bool = False):
        return self.add_voxels(np.asarray(voxel_index, np.int32)[None],
                               occupied)

    def add_voxels(self, voxel_indices, occupied: bool = False):
        """reference: OccupancyGrid::AddVoxels (occupancygrid.cu)."""
        idx = jnp.asarray(voxel_indices, jnp.int32)
        if idx.shape[0] == 0:
            return self
        R = self.resolution
        ok = jnp.all((idx >= 0) & (idx < R), -1)
        f = (idx[:, 0] * R + idx[:, 1]) * R + idx[:, 2]
        f = jnp.where(ok, f, R * R * R)
        mask = jnp.zeros((R * R * R,), jnp.bool_).at[f].set(
            True, mode="drop").reshape(R, R, R)
        zero = jnp.zeros_like(mask)
        self.prob_log, touched = _apply_log_odds(
            self.prob_log,
            zero if occupied else mask,
            mask if occupied else zero,
            jnp.float32(self.prob_miss_log), jnp.float32(self.prob_hit_log),
            jnp.float32(self.clamping_thres_min),
            jnp.float32(self.clamping_thres_max))
        self._update_bounds(touched)
        return self

    def set_free_area(self, min_bound, max_bound):
        """reference: OccupancyGrid::SetFreeArea (occupancygrid.cu:430-460)."""
        lo = self._index_of(min_bound)
        hi = self._index_of(max_bound)
        R = self.resolution
        lo = np.clip(lo, 0, R - 1)
        hi = np.clip(hi, 0, R - 1)
        coords = np.stack(np.meshgrid(
            np.arange(lo[0], hi[0] + 1), np.arange(lo[1], hi[1] + 1),
            np.arange(lo[2], hi[2] + 1), indexing="ij"), -1).reshape(-1, 3)
        return self.add_voxels(coords, occupied=False)

    def reconstruct(self, voxel_size: float, resolution: int):
        """reference: DenseGrid::Reconstruct — rescale/resize the grid
        (contents are cleared, as a fresh reconstruction)."""
        self.voxel_size = float(voxel_size)
        self.resolution = int(resolution)
        return self.clear()

    @staticmethod
    def create_from_voxel_grid(input) -> "OccupancyGrid":
        """reference: OccupancyGrid::CreateFromVoxelGrid."""
        out = OccupancyGrid(input.voxel_size)
        half = out.resolution // 2
        keys = np.asarray(input.voxels_keys)
        # voxel centers in world space -> occupancy indices
        centers = (np.asarray(input.origin)
                   + (keys.astype(np.float32) + 0.5) * input.voxel_size)
        idx = np.floor(centers / out.voxel_size).astype(np.int32) + half
        out.add_voxels(idx, occupied=True)
        return out
