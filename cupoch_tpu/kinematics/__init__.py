"""Kinematics (TPU-native replacement for src/cupoch/kinematics/)."""
from .kinematic_chain import (
    Frame,
    Joint,
    JointType,
    KinematicChain,
    Link,
    ShapeInfo,
)

__all__ = [
    "KinematicChain",
    "Frame",
    "Link",
    "Joint",
    "JointType",
    "ShapeInfo",
]
