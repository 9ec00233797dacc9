"""Camera models (reference: src/cupoch/camera/)."""
from .pinhole_camera_intrinsic import (
    PinholeCameraIntrinsic,
    PinholeCameraIntrinsicParameters,
    PinholeCameraParameters,
    PinholeCameraTrajectory,
)

__all__ = [
    "PinholeCameraIntrinsic",
    "PinholeCameraIntrinsicParameters",
    "PinholeCameraParameters",
    "PinholeCameraTrajectory",
]
