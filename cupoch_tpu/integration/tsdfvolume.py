"""TSDF volume base (reference: src/cupoch/integration/tsdfvolume.h:31-73)."""
from __future__ import annotations

import enum

import numpy as np


class TSDFVolumeColorType(enum.IntEnum):
    """reference: tsdfvolume.h:36-40 (same values)."""

    NoColor = 0
    RGB8 = 1
    Gray32 = 2


class TSDFVolume:
    """Abstract TSDF volume (reference: tsdfvolume.h:42-73)."""

    def __init__(self, voxel_length: float, sdf_trunc: float,
                 color_type: TSDFVolumeColorType):
        self.voxel_length = float(voxel_length)
        self.sdf_trunc = float(sdf_trunc)
        self.color_type = TSDFVolumeColorType(color_type)

    def reset(self):
        raise NotImplementedError

    def integrate(self, image, intrinsic, extrinsic):
        raise NotImplementedError

    def extract_point_cloud(self):
        raise NotImplementedError

    def extract_triangle_mesh(self):
        raise NotImplementedError
