"""LaserScanBuffer: ring buffer of laser scans
(reference: src/cupoch/geometry/laserscanbuffer.h:42-130 + .cu + _factory.cu).

TPU-native layout: a fixed-capacity dense [num_max_scans, num_steps]
range matrix plus [num_max_scans, 4, 4] per-scan origins — the ring is
two host-side ints (top_/bottom_) over static-shape device arrays, so
every filter is one fused jit program over the whole buffer instead of
per-scan kernel launches.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utility import console
from .geometry import Geometry3D, GeometryType

DEFAULT_NUM_MAX_SCANS = 50


@partial(jax.jit, static_argnames=("window", "neighbors",
                                   "remove_shadow_start_point"))
def _shadow_filter(ranges, min_tan, max_tan, angle_increment, window,
                   neighbors, remove_shadow_start_point):
    """Vectorised scan-shadow filter
    (apply_scan_shadow_filter_functor, laserscanbuffer.cu:57-107).

    For each step i and window offset y, a shadow between readings i and
    i+y NaNs the neighborhood of i (and optionally i itself). The
    window loop is static; each offset is a shifted comparison over the
    whole [S, num_steps] buffer.
    """
    S, num_steps = ranges.shape
    out_nan = jnp.zeros_like(ranges, dtype=bool)
    self_nan = jnp.zeros_like(ranges, dtype=bool)
    r1 = ranges
    for y in range(-window, window + 1):
        if y == 0:
            continue
        # r2[n, i] = ranges[n, i + y] (invalid outside bounds)
        r2 = jnp.roll(ranges, -y, axis=1)
        i = jnp.arange(num_steps)
        inb = (i + y >= 0) & (i + y < num_steps)
        ang = y * angle_increment
        perp_y = r2 * jnp.sin(ang)
        perp_x = r1 - r2 * jnp.cos(ang)
        perp_tan = jnp.abs(perp_y) / perp_x
        shadow = jnp.where(perp_tan > 0, perp_tan < min_tan,
                           perp_tan > max_tan) & inb[None, :]
        self_nan = self_nan | shadow
        # neighborhood wipe: ranges[n, index] for |index - i| <= neighbors
        # where ranges[n, i] < ranges[n, index]
        for off in range(-neighbors, neighbors + 1):
            tgt = jnp.roll(r1, -off, axis=1)  # ranges[n, i + off]
            t_inb = (i + off >= 0) & (i + off < num_steps)
            hit = shadow & t_inb[None, :] & (r1 < tgt)
            # mark position i + off
            out_nan = out_nan | jnp.roll(hit, off, axis=1)
    if remove_shadow_start_point:
        out_nan = out_nan | self_nan
    return jnp.where(out_nan, jnp.nan, ranges)


@jax.jit
def _scan_to_points(ranges, origins, min_angle, angle_increment,
                    min_range, max_range):
    """Project every (scan, step) reading to 3D
    (compute_points_from_scan_functor, pointcloud_factory.cu:202-237)."""
    S, num_steps = ranges.shape
    i = jnp.arange(num_steps, dtype=jnp.float32)
    angle = min_angle + i * angle_increment  # [num_steps]
    local = jnp.stack([
        ranges * jnp.cos(angle)[None, :],
        ranges * jnp.sin(angle)[None, :],
        jnp.zeros_like(ranges),
        jnp.ones_like(ranges),
    ], -1)  # [S, num_steps, 4]
    pts = jnp.einsum("sij,snj->sni", origins, local)[..., :3]
    ok = (jnp.isfinite(ranges) & (ranges >= min_range)
          & (ranges <= max_range))
    return pts.reshape(-1, 3), ok.reshape(-1)


class LaserScanBuffer(Geometry3D):
    def __init__(self, num_steps: int,
                 num_max_scans: int = DEFAULT_NUM_MAX_SCANS,
                 min_angle: float = -math.pi, max_angle: float = math.pi):
        super().__init__(GeometryType.LaserScanBuffer)
        self.num_steps_ = int(num_steps)
        self.num_max_scans_ = int(num_max_scans)
        self.min_angle_ = float(min_angle)
        self.max_angle_ = float(max_angle)
        self.top_ = 0
        self.bottom_ = 0
        self.ranges = jnp.full((self.num_max_scans_, self.num_steps_),
                               jnp.nan, jnp.float32)
        self.intensities = None
        self.origins = jnp.tile(jnp.eye(4, dtype=jnp.float32),
                                (self.num_max_scans_, 1, 1))

    # -- predicates / bookkeeping -------------------------------------
    def get_num_scans(self) -> int:
        return self.bottom_ - self.top_

    def is_full(self) -> bool:
        return self.get_num_scans() == self.num_max_scans_

    def is_empty(self) -> bool:
        return self.bottom_ == self.top_

    def has_intensities(self) -> bool:
        return self.intensities is not None

    def get_angle_increment(self) -> float:
        return (self.max_angle_ - self.min_angle_) / (self.num_steps_ - 1)

    def _slots(self) -> np.ndarray:
        """Occupied ring slots in FIFO order."""
        return np.arange(self.top_, self.bottom_) % self.num_max_scans_

    def get_ranges(self) -> np.ndarray:
        """Host copy of occupied scans, oldest first
        (GetRanges, laserscanbuffer.cu)."""
        return np.asarray(self.ranges)[self._slots()]

    def get_intensities(self) -> np.ndarray:
        if self.intensities is None:
            return np.zeros((0, self.num_steps_), np.float32)
        return np.asarray(self.intensities)[self._slots()]

    def get_origins(self) -> np.ndarray:
        return np.asarray(self.origins)[self._slots()]

    def clear(self):
        self.top_ = 0
        self.bottom_ = 0
        self.ranges = jnp.full_like(self.ranges, jnp.nan)
        self.intensities = None
        self.origins = jnp.tile(jnp.eye(4, dtype=jnp.float32),
                                (self.num_max_scans_, 1, 1))
        return self

    def __repr__(self):
        return (f"LaserScanBuffer with {self.get_num_scans()} scans of "
                f"{self.num_steps_} steps")

    # -- geometry interface -------------------------------------------
    def _all_points(self, min_range=0.0, max_range=np.inf):
        pts, ok = _scan_to_points(
            self.ranges, self.origins, jnp.float32(self.min_angle_),
            jnp.float32(self.get_angle_increment()),
            jnp.float32(min_range), jnp.float32(max_range))
        slot_mask = np.zeros(self.num_max_scans_, bool)
        slot_mask[self._slots()] = True
        ok = np.asarray(ok) & np.repeat(slot_mask, self.num_steps_)
        return np.asarray(pts), ok

    def get_min_bound(self):
        pts, ok = self._all_points()
        if not ok.any():
            return np.zeros(3, np.float32)
        return pts[ok].min(0)

    def get_max_bound(self):
        pts, ok = self._all_points()
        if not ok.any():
            return np.zeros(3, np.float32)
        return pts[ok].max(0)

    def get_center(self):
        pts, ok = self._all_points()
        if not ok.any():
            return np.zeros(3, np.float32)
        return pts[ok].mean(0)

    def get_axis_aligned_bounding_box(self):
        from .boundingvolume import AxisAlignedBoundingBox

        return AxisAlignedBoundingBox(self.get_min_bound(),
                                      self.get_max_bound())

    def transform(self, T):
        """Transforms every scan origin (Transform, laserscanbuffer.cu)."""
        T = jnp.asarray(T, jnp.float32)
        self.origins = jnp.einsum("ij,sjk->sik", T, self.origins)
        return self

    def translate(self, t, relative: bool = True):
        t = jnp.asarray(t, jnp.float32)
        self.origins = self.origins.at[:, :3, 3].add(t[None, :]) if relative \
            else self.origins.at[:, :3, 3].set(t[None, :])
        return self

    def rotate(self, R, center: bool = True):
        R = jnp.asarray(R, jnp.float32)
        self.origins = self.origins.at[:, :3, :3].set(
            jnp.einsum("ij,sjk->sik", R, self.origins[:, :3, :3]))
        return self

    def scale(self, s, center: bool = True):
        self.ranges = self.ranges * jnp.float32(s)
        return self

    # -- mutation ------------------------------------------------------
    def add_ranges(self, ranges, transformation=None, intensities=None):
        """Push scan(s); evicts the oldest when full
        (AddRanges, laserscanbuffer.cu)."""
        r = np.asarray(ranges, np.float32).reshape(-1, self.num_steps_)
        k = r.shape[0]
        T = (np.eye(4, dtype=np.float32) if transformation is None
             else np.asarray(transformation, np.float32))
        if intensities is not None:
            ints = np.asarray(intensities, np.float32).reshape(
                -1, self.num_steps_)
            if self.intensities is None:
                self.intensities = jnp.full_like(self.ranges, jnp.nan)
        for j in range(k):
            slot = self.bottom_ % self.num_max_scans_
            self.ranges = jax.lax.dynamic_update_slice(
                self.ranges, jnp.asarray(r[j])[None], (slot, 0))
            self.origins = jax.lax.dynamic_update_slice(
                self.origins, jnp.asarray(T)[None], (slot, 0, 0))
            if intensities is not None:
                self.intensities = jax.lax.dynamic_update_slice(
                    self.intensities, jnp.asarray(ints[j])[None], (slot, 0))
            self.bottom_ += 1
            if self.bottom_ - self.top_ > self.num_max_scans_:
                self.top_ += 1
        return self

    add_host_ranges = add_ranges  # host/device distinction is moot here

    def merge(self, other: "LaserScanBuffer"):
        if (other.num_steps_ != self.num_steps_
                or other.min_angle_ != self.min_angle_
                or other.max_angle_ != self.max_angle_):
            console.log_error("[LaserScanBuffer::Merge] buffers are not "
                              "compatible.")
        ints = other.get_intensities() if other.has_intensities() else None
        ranges = other.get_ranges()
        origins = other.get_origins()
        for j in range(ranges.shape[0]):
            self.add_ranges(ranges[j], origins[j],
                            None if ints is None else ints[j])
        return self

    def pop_one_scan(self):
        """Removes + returns the oldest scan as a 1-scan buffer
        (PopOneScan)."""
        if self.is_empty():
            console.log_warning("[LaserScanBuffer::PopOneScan] empty buffer.")
            return None
        slot = self.top_ % self.num_max_scans_
        out = LaserScanBuffer(self.num_steps_, 1, self.min_angle_,
                              self.max_angle_)
        r = np.asarray(self.ranges)[slot]
        o = np.asarray(self.origins)[slot]
        i = (np.asarray(self.intensities)[slot]
             if self.intensities is not None else None)
        out.add_ranges(r, o, i)
        self.top_ += 1
        return out

    def pop_host_one_scan(self) -> Tuple[np.ndarray, np.ndarray]:
        """(ranges, intensities) of the oldest scan (PopHostOneScan)."""
        scan = self.pop_one_scan()
        if scan is None:
            return (np.zeros(0, np.float32), np.zeros(0, np.float32))
        ints = (scan.get_intensities()[0] if scan.has_intensities()
                else np.zeros(0, np.float32))
        return scan.get_ranges()[0], ints

    # -- filters -------------------------------------------------------
    def range_filter(self, min_range: float, max_range: float
                     ) -> "LaserScanBuffer":
        """NaNs readings outside [min_range, max_range] (RangeFilter)."""
        if min_range >= max_range:
            console.log_error(
                "[LaserScanBuffer::RangeFilter] min_range must be smaller "
                "than max_range.")
        out = self._copy()
        out.ranges = jnp.where(
            (self.ranges < min_range) | (self.ranges > max_range),
            jnp.nan, self.ranges)
        return out

    def scan_shadows_filter(self, min_angle: float, max_angle: float,
                            window: int, neighbors: int = 0,
                            remove_shadow_start_point: bool = False
                            ) -> "LaserScanBuffer":
        """Removes veiling points (ScanShadowsFilter,
        laserscanbuffer.cu:437+). min/max_angle are the perpendicular
        test angles in degrees (as in the laser_filters ROS package)."""
        min_tan = math.tan(math.radians(min_angle))
        max_tan = math.tan(math.radians(max_angle))
        if min_tan < 0:
            min_tan = -min_tan
        if max_tan > 0:
            max_tan = -max_tan
        out = self._copy()
        out.ranges = _shadow_filter(
            self.ranges, jnp.float32(min_tan), jnp.float32(max_tan),
            jnp.float32(self.get_angle_increment()), int(window),
            int(neighbors), bool(remove_shadow_start_point))
        return out

    def _copy(self) -> "LaserScanBuffer":
        out = LaserScanBuffer(self.num_steps_, self.num_max_scans_,
                              self.min_angle_, self.max_angle_)
        out.top_, out.bottom_ = self.top_, self.bottom_
        out.ranges = self.ranges
        out.intensities = self.intensities
        out.origins = self.origins
        return out

    # -- factories -----------------------------------------------------
    @staticmethod
    def create_from_point_cloud(pcd, angle_increment: float,
                                min_height: float, max_height: float,
                                num_vertical_divisions: int = 1,
                                min_range: float = 0.0,
                                max_range: float = np.inf,
                                min_angle: float = -math.pi,
                                max_angle: float = math.pi
                                ) -> Optional["LaserScanBuffer"]:
        """Bins points into (height-slice, bearing) cells keeping the
        min range per cell (pointcloud_to_laserscan_functor,
        laserscanbuffer_factory.cu:34-82) — the CUDA atomic min becomes
        one scatter-min."""
        if angle_increment <= 0.0:
            console.log_error("[LaserScanBuffer::CreateFromPointCloud] "
                              "angle_increment must be positive.")
            return None
        if min_height >= max_height:
            console.log_error("[LaserScanBuffer::CreateFromPointCloud] "
                              "min_height must be smaller than max_height.")
            return None
        if min_range >= max_range:
            console.log_error("[LaserScanBuffer::CreateFromPointCloud] "
                              "min_range must be smaller than max_range.")
            return None
        if min_angle >= max_angle:
            console.log_error("[LaserScanBuffer::CreateFromPointCloud] "
                              "min_angle must be smaller than max_angle.")
            return None
        num_steps = int(math.ceil((max_angle - min_angle) / angle_increment))
        num_max_scans = max(DEFAULT_NUM_MAX_SCANS, num_vertical_divisions)
        buf = LaserScanBuffer(num_steps, num_max_scans, min_angle, max_angle)
        height_increment = (max_height - min_height) / num_vertical_divisions

        pts = jnp.asarray(pcd.points, jnp.float32)
        rng = jnp.hypot(pts[:, 0], pts[:, 1])
        ang = jnp.arctan2(pts[:, 1], pts[:, 0])
        row = jnp.floor((pts[:, 2] - min_height) / height_increment
                        ).astype(jnp.int32)
        col = jnp.floor((ang - min_angle) / angle_increment).astype(jnp.int32)
        ok = ((rng >= min_range) & (rng <= max_range)
              & (ang >= min_angle) & (ang <= max_angle)
              & (row >= 0) & (row < num_max_scans)
              & (col >= 0) & (col < num_steps))
        flat = jnp.where(ok, row * num_steps + col, num_max_scans * num_steps)
        grid = jnp.full(num_max_scans * num_steps + 1, jnp.inf, jnp.float32)
        grid = grid.at[flat].min(jnp.where(ok, rng, jnp.inf))
        ranges = grid[:-1].reshape(num_max_scans, num_steps)
        buf.ranges = jnp.where(jnp.isfinite(ranges), ranges, jnp.nan)
        origins = np.tile(np.eye(4, dtype=np.float32), (num_max_scans, 1, 1))
        origins[:, 2, 3] = min_height + (max_height - min_height) * np.arange(
            num_max_scans) / num_vertical_divisions
        buf.origins = jnp.asarray(origins)
        buf.bottom_ += num_vertical_divisions
        return buf

    @staticmethod
    def create_from_depth_image(depth, intrinsic, angle_increment: float,
                                min_y: float, max_y: float,
                                num_vertical_divisions: int = 1,
                                min_range: float = 0.0,
                                max_range: float = np.inf,
                                min_angle: float = -math.pi,
                                max_angle: float = math.pi,
                                depth_scale: float = 1000.0,
                                depth_trunc: float = 1000.0,
                                stride: int = 1
                                ) -> Optional["LaserScanBuffer"]:
        """Depth image → cloud → scan (CreateFromDepthImage,
        laserscanbuffer_factory.cu:146-183). The camera looks +z; the
        scan plane is x-z, so points are rotated into the scan frame
        with y up."""
        from .pointcloud import PointCloud

        pcd = PointCloud.create_from_depth_image(
            depth, intrinsic, depth_scale=depth_scale,
            depth_trunc=depth_trunc, stride=stride)
        # camera frame (z forward, y down) -> laser frame (x forward, z up)
        flip = np.asarray([[0.0, 0.0, 1.0, 0.0],
                           [-1.0, 0.0, 0.0, 0.0],
                           [0.0, -1.0, 0.0, 0.0],
                           [0.0, 0.0, 0.0, 1.0]], np.float32)
        pcd.transform(flip)
        return LaserScanBuffer.create_from_point_cloud(
            pcd, angle_increment, min_y, max_y, num_vertical_divisions,
            min_range, max_range, min_angle, max_angle)
