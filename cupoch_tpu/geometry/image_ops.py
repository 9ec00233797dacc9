"""Image kernels — pure jit-safe functions over [H, W, C] float arrays.

reference: src/cupoch/geometry/image.cu (649 LoC) + image_factory.cu.
The reference runs one Thrust functor per pixel with clamped
addressing; here each filter is an XLA convolution (edge-padded) so it
fuses and tiles onto the TPU VPU/MXU, and pyramids are unrolled static
Python loops over per-level shapes.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# separable filter taps (reference: image.cu Gaussian/Sobel constants)
GAUSSIAN_3 = np.asarray([0.25, 0.5, 0.25], np.float32)
GAUSSIAN_5 = np.asarray([1, 4, 6, 4, 1], np.float32) / 16.0
GAUSSIAN_7 = np.asarray([1, 6, 15, 20, 15, 6, 1], np.float32) / 64.0
SOBEL_EDGE = np.asarray([-1.0, 0.0, 1.0], np.float32)
SOBEL_SMOOTH = np.asarray([1.0, 2.0, 1.0], np.float32)


def _sep_conv2d(img: jax.Array, kx: np.ndarray, ky: np.ndarray) -> jax.Array:
    """Separable 2D convolution with edge-clamped padding.

    img: [H, W, C] float32. Matches the reference's clamped pixel
    addressing at borders (image.cu filter functors).
    """
    H, W, C = img.shape
    rx, ry = len(kx) // 2, len(ky) // 2
    x = jnp.pad(img, ((ry, ry), (rx, rx), (0, 0)), mode="edge")
    # NHWC with feature_group_count=C for depthwise filtering
    x = x[None]  # [1, H+2ry, W+2rx, C]
    ky_f = jnp.asarray(ky, jnp.float32)[:, None, None, None]
    ky_f = jnp.tile(ky_f, (1, 1, 1, C))  # [kh, 1, 1, C]
    x = jax.lax.conv_general_dilated(
        x, ky_f, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)
    kx_f = jnp.asarray(kx, jnp.float32)[None, :, None, None]
    kx_f = jnp.tile(kx_f, (1, 1, 1, C))
    x = jax.lax.conv_general_dilated(
        x, kx_f, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)
    return x[0]


@jax.jit
def filter_gaussian3(img):
    return _sep_conv2d(img, GAUSSIAN_3, GAUSSIAN_3)


@jax.jit
def filter_gaussian5(img):
    return _sep_conv2d(img, GAUSSIAN_5, GAUSSIAN_5)


@jax.jit
def filter_gaussian7(img):
    return _sep_conv2d(img, GAUSSIAN_7, GAUSSIAN_7)


@jax.jit
def filter_sobel_dx(img):
    """Sobel horizontal gradient (reference: image.cu Sobel3Dx)."""
    return _sep_conv2d(img, SOBEL_EDGE, SOBEL_SMOOTH)


@jax.jit
def filter_sobel_dy(img):
    return _sep_conv2d(img, SOBEL_SMOOTH, SOBEL_EDGE)


@partial(jax.jit, static_argnames=("diameter",))
def filter_bilateral(img: jax.Array, diameter: int, sigma_color, sigma_space):
    """Brute-force bilateral filter over a (2r+1)^2 window.

    reference: image.cu bilateral_filter_functor. Expressed as a static
    unrolled sum of shifted images so XLA fuses it into one elementwise
    pipeline — no gather needed.
    """
    H, W, C = img.shape
    r = diameter // 2
    pad = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="edge")
    inv_2sc2 = 1.0 / (2.0 * sigma_color ** 2)
    inv_2ss2 = 1.0 / (2.0 * sigma_space ** 2)
    acc = jnp.zeros_like(img)
    wacc = jnp.zeros((H, W, C), img.dtype)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = jax.lax.dynamic_slice(pad, (dy + r, dx + r, 0), (H, W, C))
            diff = shifted - img
            w = jnp.exp(-(diff * diff) * inv_2sc2
                        - (dy * dy + dx * dx) * inv_2ss2)
            acc = acc + w * shifted
            wacc = wacc + w
    return acc / jnp.maximum(wacc, 1e-12)


@jax.jit
def downsample2(img: jax.Array) -> jax.Array:
    """2x box downsample (reference: image.cu downsample_functor —
    average of the 2x2 block)."""
    H, W, C = img.shape
    h2, w2 = H // 2, W // 2
    x = img[: h2 * 2, : w2 * 2]
    x = x.reshape(h2, 2, w2, 2, C)
    return jnp.mean(x, axis=(1, 3))


@partial(jax.jit, static_argnames=("half_kernel_size",))
def dilate(img: jax.Array, half_kernel_size: int = 1) -> jax.Array:
    """Binary dilation (reference: image.cu dilate_functor)."""
    r = half_kernel_size
    H, W, C = img.shape
    pad = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="constant")
    out = jnp.zeros_like(img)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            out = jnp.maximum(
                out, jax.lax.dynamic_slice(pad, (dy + r, dx + r, 0), (H, W, C)))
    return out


@jax.jit
def flip_horizontal(img):
    return img[:, ::-1]


@jax.jit
def flip_vertical(img):
    return img[::-1]


@jax.jit
def transpose(img):
    return jnp.swapaxes(img, 0, 1)


@jax.jit
def linear_transform(img, scale, offset):
    """reference: image.cu LinearTransform."""
    return img * scale + offset


@jax.jit
def clip_intensity(img, min_v, max_v):
    return jnp.clip(img, min_v, max_v)


@jax.jit
def color_to_intensity(img: jax.Array) -> jax.Array:
    """RGB -> single-channel float intensity.

    reference: image_factory.cu CreateFloatImage weighted conversion
    (0.2990, 0.5870, 0.1140)."""
    w = jnp.asarray([0.2990, 0.5870, 0.1140], jnp.float32)
    return jnp.sum(img * w, axis=-1, keepdims=True)


@jax.jit
def float_value_at(img: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Bilinear sample at continuous (u, v) pixel coords, channel 0.

    reference: image.h FloatValueAt (bilinear with clamped neighbors).
    u is the column (x), v the row (y). Batched over u/v of any shape.
    """
    H, W = img.shape[0], img.shape[1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    au = u - u0
    av = v - v0
    u0i = jnp.clip(u0.astype(jnp.int32), 0, W - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, H - 1)
    u1i = jnp.clip(u0i + 1, 0, W - 1)
    v1i = jnp.clip(v0i + 1, 0, H - 1)
    p00 = img[v0i, u0i, 0]
    p01 = img[v0i, u1i, 0]
    p10 = img[v1i, u0i, 0]
    p11 = img[v1i, u1i, 0]
    return ((1 - av) * ((1 - au) * p00 + au * p01)
            + av * ((1 - au) * p10 + au * p11))


def depth_to_camera_distance_multiplier(width: int, height: int,
                                        intrinsic_matrix: np.ndarray) -> jax.Array:
    """Per-pixel z-depth -> ray-distance multiplier image.

    reference: image_factory.cu
    CreateDepthToCameraDistanceMultiplierFloatImage."""
    K = np.asarray(intrinsic_matrix, np.float32)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    uu, vv = jnp.meshgrid(jnp.arange(width, dtype=jnp.float32),
                          jnp.arange(height, dtype=jnp.float32))
    xx = (uu - cx) / fx
    yy = (vv - cy) / fy
    return jnp.sqrt(xx * xx + yy * yy + 1.0)[..., None]


def depth_to_points(depth: jax.Array, intrinsic_matrix,
                    extrinsic=None) -> Tuple[jax.Array, jax.Array]:
    """Back-project a depth image to camera/world-frame points.

    reference: pointcloud_factory.cu depth_to_pointcloud_functor.
    Returns ([H*W, 3] points, [H*W] validity mask); invalid pixels
    (depth<=0 or non-finite) masked out, shape static.
    """
    K = jnp.asarray(intrinsic_matrix, jnp.float32)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    H, W = depth.shape[0], depth.shape[1]
    d = depth[..., 0] if depth.ndim == 3 else depth
    uu, vv = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))
    z = d
    x = (uu - cx) * z / fx
    y = (vv - cy) * z / fy
    pts = jnp.stack([x, y, z], -1).reshape(-1, 3)
    mask = ((z > 0.0) & jnp.isfinite(z)).reshape(-1)
    if extrinsic is not None:
        T = jnp.asarray(extrinsic, jnp.float32)
        # camera-to-world: apply inverse extrinsic
        R = T[:3, :3]
        t = T[:3, 3]
        pts = (pts - t) @ R  # R^T @ (p - t), rows
    return pts, mask
