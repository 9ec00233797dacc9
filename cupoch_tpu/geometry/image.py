"""Image / RGBDImage containers.

reference: src/cupoch/geometry/image.h:77-263 (byte-buffer image with
width/height/channels), rgbdimage.h (color+depth pair + pyramids).
Here an Image wraps one [H, W, C] jax Array; float images are float32,
raw sensor images keep uint8/uint16. Filters come from `image_ops`.
"""
from __future__ import annotations

import enum
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utility import console
from . import image_ops as ops
from .geometry import Geometry2D, GeometryType


class FilterType(enum.IntEnum):
    """reference: image.h:84-90 (same enum values)."""

    Gaussian3 = 0
    Gaussian5 = 1
    Gaussian7 = 2
    Sobel3Dx = 3
    Sobel3Dy = 4


_FILTERS = {
    FilterType.Gaussian3: ops.filter_gaussian3,
    FilterType.Gaussian5: ops.filter_gaussian5,
    FilterType.Gaussian7: ops.filter_gaussian7,
    FilterType.Sobel3Dx: ops.filter_sobel_dx,
    FilterType.Sobel3Dy: ops.filter_sobel_dy,
}


class Image(Geometry2D):
    """2D image over a [H, W, C] array (reference: image.h:77)."""

    def __init__(self, data=None):
        super().__init__(GeometryType.Image)
        if data is None:
            self.data = jnp.zeros((0, 0, 1), jnp.float32)
        else:
            d = jnp.asarray(data)
            if d.ndim == 2:
                d = d[..., None]
            self.data = d

    # -- cupoch-compatible metadata ------------------------------------
    @property
    def width(self) -> int:
        return int(self.data.shape[1])

    @property
    def height(self) -> int:
        return int(self.data.shape[0])

    @property
    def num_of_channels(self) -> int:
        return int(self.data.shape[2])

    @property
    def bytes_per_channel(self) -> int:
        return int(jnp.dtype(self.data.dtype).itemsize)

    def is_empty(self) -> bool:
        return self.width == 0 or self.height == 0

    def has_data(self) -> bool:
        return not self.is_empty()

    def clear(self):
        self.data = jnp.zeros((0, 0, 1), jnp.float32)
        return self

    def __repr__(self):
        return (f"Image of size {self.width}x{self.height}, with "
                f"{self.num_of_channels} channels ({self.data.dtype}).")

    def get_min_bound(self):
        return np.zeros(2, np.float32)

    def get_max_bound(self):
        return np.asarray([self.width, self.height], np.float32)

    # -- conversions ----------------------------------------------------
    def create_float_image(self) -> "Image":
        """reference: image_factory.cu CreateFloatImage — normalize to
        [0,1] float; 3-channel converts to intensity."""
        d = self.data
        if d.dtype == jnp.uint8:
            f = d.astype(jnp.float32) / 255.0
        elif d.dtype == jnp.uint16:
            f = d.astype(jnp.float32) / 65535.0
        else:
            f = d.astype(jnp.float32)
        if f.shape[2] >= 3:
            f = ops.color_to_intensity(f[..., :3])
        return Image(f)

    def create_gray_image(self) -> "Image":
        f = self.data.astype(jnp.float32)
        if f.shape[2] >= 3:
            f = ops.color_to_intensity(f[..., :3])
        return Image(f)

    # -- ops ------------------------------------------------------------
    def filter(self, filter_type: FilterType) -> "Image":
        """reference: image.cu Image::Filter."""
        if self.num_of_channels != 1:
            console.log_warning("[filter] multi-channel filter applied per channel.")
        return Image(_FILTERS[FilterType(filter_type)](
            self.data.astype(jnp.float32)))

    def filter_bilateral(self, diameter: int = 5, sigma_color: float = 0.05,
                         sigma_space: float = 10.0) -> "Image":
        return Image(ops.filter_bilateral(
            self.data.astype(jnp.float32), diameter,
            jnp.float32(sigma_color), jnp.float32(sigma_space)))

    def downsample(self) -> "Image":
        return Image(ops.downsample2(self.data.astype(jnp.float32)))

    def dilate(self, half_kernel_size: int = 1) -> "Image":
        return Image(ops.dilate(self.data.astype(jnp.float32), half_kernel_size))

    def flip_horizontal(self) -> "Image":
        return Image(ops.flip_horizontal(self.data))

    def flip_vertical(self) -> "Image":
        return Image(ops.flip_vertical(self.data))

    def transpose(self) -> "Image":
        return Image(ops.transpose(self.data))

    def linear_transform(self, scale: float = 1.0, offset: float = 0.0) -> "Image":
        return Image(ops.linear_transform(
            self.data.astype(jnp.float32), jnp.float32(scale), jnp.float32(offset)))

    def clip_intensity(self, min_v: float = 0.0, max_v: float = 1.0) -> "Image":
        return Image(ops.clip_intensity(
            self.data.astype(jnp.float32), jnp.float32(min_v), jnp.float32(max_v)))

    def float_value_at(self, u: float, v: float) -> Tuple[bool, float]:
        ok = 0.0 <= u <= self.width - 1 and 0.0 <= v <= self.height - 1
        val = float(ops.float_value_at(
            self.data.astype(jnp.float32), jnp.float32(u), jnp.float32(v)))
        return ok, val

    def create_pyramid(self, num_of_levels: int,
                       with_gaussian_filter: bool = True) -> List["Image"]:
        """reference: image.cu CreatePyramid."""
        pyr = [Image(self.data.astype(jnp.float32))]
        for _ in range(1, num_of_levels):
            prev = pyr[-1]
            img = prev.filter(FilterType.Gaussian3) if with_gaussian_filter else prev
            pyr.append(img.downsample())
        return pyr

    @staticmethod
    def filter_pyramid(pyramid: List["Image"], filter_type: FilterType) -> List["Image"]:
        return [im.filter(filter_type) for im in pyramid]

    def create_depth_to_camera_distance_multiplier_float_image(
            self, intrinsic) -> "Image":
        return Image(ops.depth_to_camera_distance_multiplier(
            self.width, self.height, intrinsic.intrinsic_matrix))

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.data)

    @staticmethod
    def from_numpy(arr) -> "Image":
        return Image(arr)


class RGBDImage(Geometry2D):
    """Color + depth pair (reference: rgbdimage.h:38-112)."""

    def __init__(self, color: Optional[Image] = None,
                 depth: Optional[Image] = None):
        super().__init__(GeometryType.RGBDImage)
        self.color = color if color is not None else Image()
        self.depth = depth if depth is not None else Image()

    def is_empty(self) -> bool:
        return self.color.is_empty() or self.depth.is_empty()

    def clear(self):
        self.color.clear()
        self.depth.clear()
        return self

    def __repr__(self):
        return (f"RGBDImage of size \nColor image : {self.color!r}\n"
                f"Depth image : {self.depth!r}")

    @staticmethod
    def create_from_color_and_depth(
            color: Image, depth: Image, depth_scale: float = 1000.0,
            depth_trunc: float = 3.0,
            convert_rgb_to_intensity: bool = True) -> "RGBDImage":
        """reference: rgbdimage_factory.cu CreateFromColorAndDepth —
        depth/depth_scale metres, truncated beyond depth_trunc."""
        c = color.create_float_image() if convert_rgb_to_intensity else Image(
            color.data.astype(jnp.float32)
            / (255.0 if color.data.dtype == jnp.uint8 else 1.0))
        d = depth.data.astype(jnp.float32)
        if d.ndim == 2:
            d = d[..., None]
        d = d / jnp.float32(depth_scale)
        d = jnp.where(d > depth_trunc, 0.0, d)
        return RGBDImage(c, Image(d))

    @staticmethod
    def create_from_tum_format(color: Image, depth: Image,
                               convert_rgb_to_intensity: bool = True) -> "RGBDImage":
        """reference: rgbdimage_factory.cu (TUM: depth_scale=5000)."""
        return RGBDImage.create_from_color_and_depth(
            color, depth, 5000.0, 4.0, convert_rgb_to_intensity)

    @staticmethod
    def create_from_redwood_format(color: Image, depth: Image,
                                   convert_rgb_to_intensity: bool = True) -> "RGBDImage":
        return RGBDImage.create_from_color_and_depth(
            color, depth, 1000.0, 4.0, convert_rgb_to_intensity)

    @staticmethod
    def create_from_nyu_format(color: Image, depth: Image,
                               convert_rgb_to_intensity: bool = True) -> "RGBDImage":
        return RGBDImage.create_from_color_and_depth(
            color, depth, 1000.0, 7.0, convert_rgb_to_intensity)

    def create_pyramid(self, num_of_levels: int,
                       with_gaussian_filter_for_color: bool = True,
                       with_gaussian_filter_for_depth: bool = False
                       ) -> List["RGBDImage"]:
        """reference: rgbdimage.cu CreatePyramid (depth unsmoothed by
        default, like the reference)."""
        cp = self.color.create_pyramid(num_of_levels, with_gaussian_filter_for_color)
        dp = self.depth.create_pyramid(num_of_levels, with_gaussian_filter_for_depth)
        return [RGBDImage(c, d) for c, d in zip(cp, dp)]
