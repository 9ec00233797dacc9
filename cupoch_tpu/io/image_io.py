"""Image file IO: PNG / JPG.

reference: src/cupoch/io/file_format/file_png.cpp / file_jpg.cpp
(libpng / libjpeg-turbo). Here PIL is the host codec (baked into the
image), gated so the rest of the library works without it.
"""
from __future__ import annotations

import os

import numpy as np

from ..utility import console

try:
    from PIL import Image as _PILImage

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False


def read_image(path: str):
    """Returns a geometry.Image; 16-bit PNGs keep uint16 (depth maps)."""
    from ..geometry.image import Image

    if not _HAS_PIL:
        console.log_error("[ReadImage] PIL is not available.")
    im = _PILImage.open(path)
    arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[..., None]
    return Image(arr)


def write_image(path: str, image, quality: int = 90) -> bool:
    if not _HAS_PIL:
        console.log_error("[WriteImage] PIL is not available.")
    arr = image.to_numpy() if hasattr(image, "to_numpy") else np.asarray(image)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[..., 0]
    if arr.dtype in (np.float32, np.float64):
        arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    _PILImage.fromarray(arr).save(path, quality=quality)
    return True
