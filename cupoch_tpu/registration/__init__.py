"""Registration pipelines (TPU-native replacement for
src/cupoch/registration/)."""
from .estimation import (
    TransformationEstimation,
    TransformationEstimationPointToPoint,
    TransformationEstimationPointToPlane,
    TransformationEstimationSymmetricMethod,
    TransformationEstimationType,
)
from .kabsch import kabsch, kabsch_weighted
from .registration import (
    ICPConvergenceCriteria,
    RegistrationResult,
    evaluate_registration,
    registration_icp,
)

__all__ = [
    "ICPConvergenceCriteria",
    "RegistrationResult",
    "registration_icp",
    "evaluate_registration",
    "kabsch",
    "kabsch_weighted",
    "TransformationEstimation",
    "TransformationEstimationPointToPoint",
    "TransformationEstimationPointToPlane",
    "TransformationEstimationSymmetricMethod",
    "TransformationEstimationType",
]
