"""Volumetric TSDF integration (reference: src/cupoch/integration/)."""
from .tsdfvolume import TSDFVolume, TSDFVolumeColorType
from .uniform_tsdfvolume import UniformTSDFVolume
from .scalable_tsdfvolume import ScalableTSDFVolume

__all__ = [
    "TSDFVolume",
    "TSDFVolumeColorType",
    "UniformTSDFVolume",
    "ScalableTSDFVolume",
]
