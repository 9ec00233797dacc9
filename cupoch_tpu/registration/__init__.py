"""Registration pipelines (TPU-native replacement for
src/cupoch/registration/)."""
from .fast_global_registration import (
    FastGlobalRegistrationOption,
    fast_global_registration,
)
from .feature import (
    Feature,
    compute_fpfh_feature,
    correspondences_from_features,
)
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
    "FastGlobalRegistrationOption",
    "fast_global_registration",
    "Feature",
    "compute_fpfh_feature",
    "correspondences_from_features",
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
