"""Core runtime layer (TPU-native replacement for src/cupoch/utility/).

Device vectors, allocators, and streams from the reference are
unnecessary here: jax.Array + XLA's async dispatch subsume them. What
remains are the algorithmic building blocks (SE(3) ops, Gauss-Newton
reductions, tiny eigensolvers), logging, and shape/mask discipline.
"""
from . import console, eigen, shape, transforms

# dl_converter is imported lazily by cupoch_tpu.__init__ consumers to
# avoid a geometry<->utility import cycle at package-load time.
from .console import (
    ConsoleProgressBar,
    VerbosityLevel,
    get_verbosity_level,
    log_debug,
    log_error,
    log_info,
    log_warning,
    set_verbosity_level,
)
from .eigen import (
    compute_jtj_jtr,
    solve_jacobian_system,
    solve_linear_system_psd,
    symeig3x3,
)
from .shape import INVALID_INDEX, bucket_size, pad_axis0, valid_mask
from .transforms import (
    exp_se3,
    exp_so3,
    hat,
    inverse_transform,
    log_se3,
    log_so3,
    make_transform,
    quaternion_from_rotation,
    rotation_from_axis_angle,
    rotation_from_euler,
    rotation_from_quaternion,
    rotation_matrix_x,
    rotation_matrix_y,
    rotation_matrix_z,
    transform_points,
    transform_vector6_to_matrix4,
)


def is_tpu_available() -> bool:
    """Analog of utility::IsCudaAvailable (utility/platform.h:52)."""
    import jax

    try:
        return any(d.platform != "cpu" for d in jax.devices())
    except RuntimeError:
        return False
