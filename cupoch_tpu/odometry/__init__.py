"""RGB-D visual odometry (reference: src/cupoch/odometry/)."""
from .odometry import (
    OdometryOption,
    RGBDOdometryJacobian,
    RGBDOdometryJacobianFromColorTerm,
    RGBDOdometryJacobianFromHybridTerm,
    compute_rgbd_odometry,
    compute_weighted_rgbd_odometry,
)

__all__ = [
    "OdometryOption",
    "RGBDOdometryJacobian",
    "RGBDOdometryJacobianFromColorTerm",
    "RGBDOdometryJacobianFromHybridTerm",
    "compute_rgbd_odometry",
    "compute_weighted_rgbd_odometry",
]
