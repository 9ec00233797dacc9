"""SO(3)/SE(3) helpers and rotation-matrix builders.

TPU-native replacements for the reference's Eigen-based helpers:
  - 6-vector -> 4x4 extrinsic (reference: src/cupoch/utility/eigen.h:64
    ``TransformVector6fToMatrix4f``, which composes Euler angles
    Rz(r2) * Ry(r1) * Rx(r0) with a translation).
  - rotation builders for every Euler convention, axis-angle and
    quaternion (reference: src/cupoch/geometry/geometry_utils.h:29-146).
  - proper exp/log maps used by odometry/pose-graph code.

Everything is pure jnp and safe under jit/vmap/grad.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of a 3-vector (batched on leading dims)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        -2,
    )


def vee(W: jax.Array) -> jax.Array:
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], -1)


def exp_so3(w: jax.Array) -> jax.Array:
    """Rodrigues' formula, Taylor-safe near zero."""
    theta2 = jnp.sum(w * w, -1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = hat(w)
    W2 = W @ W
    small = theta2 < _EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def log_so3(R: jax.Array) -> jax.Array:
    """Inverse of exp_so3 (angle in [0, pi)).

    Autodiff-safe: every non-selected `where` branch is evaluated on
    sanitised inputs (the double-where trick), so jacobians through
    log_so3 stay finite at theta = 0 — required by the pose-graph GN
    (slam/pose_graph.py uses jacfwd through this)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # NOTE: 1-1e-8 is not representable in float32 (rounds to 1.0,
    # which would never trigger); 1e-6 gives theta < ~1.4e-3 where the
    # scale=1 approximation is accurate to ~3e-7
    small = cos > 1.0 - 1e-6
    # arccos gradient blows up at cos=1; feed it a safe value there and
    # never use that branch's output for small angles
    cos_safe = jnp.where(small, 0.0, cos)
    theta = jnp.where(small, 0.0, jnp.arccos(cos_safe))
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5
    sin_safe = jnp.where(small, 1.0, jnp.sin(theta))
    # theta/sin(theta) -> 1 as theta -> 0 (w itself is exact to O(θ³))
    scale = jnp.where(small[..., None], 1.0,
                      theta[..., None]
                      / jnp.where(jnp.abs(sin_safe) < _EPS, _EPS,
                                  sin_safe)[..., None])
    # near pi the above is ill-conditioned; fall back to diagonal method
    near_pi = theta > 3.0
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1)
    axis_sq = jnp.clip(
        (diag - cos[..., None])
        / jnp.maximum(1.0 - cos[..., None], _EPS), 0, None)
    # sqrt gradient at 0 is inf; sanitise where the branch is unused
    axis_sq = jnp.where(near_pi[..., None], axis_sq, 1.0)
    axis = jnp.sqrt(axis_sq)
    signs = jnp.stack(
        [
            jnp.sign(R[..., 2, 1] - R[..., 1, 2]),
            jnp.sign(R[..., 0, 2] - R[..., 2, 0]),
            jnp.sign(R[..., 1, 0] - R[..., 0, 1]),
        ],
        -1,
    )
    signs = jnp.where(signs == 0, 1.0, signs)
    w_pi = axis * signs * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w * scale)


def exp_se3(xi: jax.Array) -> jax.Array:
    """se(3) exp: xi = [w, v] (rotation first) -> 4x4 transform."""
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, -1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = hat(w)
    W2 = W @ W
    small = theta2 < _EPS
    R = exp_so3(w)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + b * W + c * W2
    t = (V @ v[..., None])[..., 0]
    return make_transform(R, t)


def log_se3(T: jax.Array) -> jax.Array:
    """Autodiff-safe (see log_so3): the large-angle branch is evaluated
    on sanitised theta so jacobians stay finite at identity."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    w = log_so3(R)
    theta2 = jnp.sum(w * w, -1, keepdims=True)[..., None]
    W = hat(w)
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    half_cot = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - 0.5 * theta * jnp.sin(theta)
         / jnp.maximum(1.0 - jnp.cos(theta), _EPS)) / theta2_safe,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), R.shape)
    Vinv = eye - 0.5 * W + half_cot * (W @ W)
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([w, v], -1)


def make_transform(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble [..., 4, 4] homogeneous transform from R and t."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def inverse_transform(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_transform(Rt, -(Rt @ t[..., None])[..., 0])


def transform_vector6_to_matrix4(x: jax.Array) -> jax.Array:
    """Euler-angle 6-vector (rx, ry, rz, tx, ty, tz) -> 4x4.

    Matches the reference solver output convention
    (src/cupoch/utility/eigen.h:64): R = Rz(rz) @ Ry(ry) @ Rx(rx).
    """
    R = (rotation_matrix_z(x[..., 2]) @ rotation_matrix_y(x[..., 1])
         @ rotation_matrix_x(x[..., 0]))
    return make_transform(R, x[..., 3:6])


def _rot_axis(c, s, axis):
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    if axis == 0:
        rows = [[o, z, z], [z, c, -s], [z, s, c]]
    elif axis == 1:
        rows = [[c, z, s], [z, o, z], [-s, z, c]]
    else:
        rows = [[c, -s, z], [s, c, z], [z, z, o]]
    return jnp.stack([jnp.stack(r, -1) for r in rows], -2)


def rotation_matrix_x(a):
    a = jnp.asarray(a)
    return _rot_axis(jnp.cos(a), jnp.sin(a), 0)


def rotation_matrix_y(a):
    a = jnp.asarray(a)
    return _rot_axis(jnp.cos(a), jnp.sin(a), 1)


def rotation_matrix_z(a):
    a = jnp.asarray(a)
    return _rot_axis(jnp.cos(a), jnp.sin(a), 2)


_AXIS_FN = {"X": rotation_matrix_x, "Y": rotation_matrix_y, "Z": rotation_matrix_z}


def rotation_from_euler(order: str, angles: jax.Array) -> jax.Array:
    """Intrinsic Euler composition, e.g. order="XYZ" -> Rx@Ry@Rz.

    Mirrors GetRotationMatrixFrom{XYZ,YZX,ZXY,XZY,ZYX,YXZ}
    (reference: src/cupoch/geometry/geometry_utils.h:63-101).
    """
    angles = jnp.asarray(angles)
    R = _AXIS_FN[order[0]](angles[..., 0])
    for i, ax in enumerate(order[1:], start=1):
        R = R @ _AXIS_FN[ax](angles[..., i])
    return R


def rotation_from_axis_angle(axis_angle: jax.Array) -> jax.Array:
    """Axis-angle vector (direction * angle) -> rotation matrix."""
    return exp_so3(jnp.asarray(axis_angle))


def rotation_from_quaternion(q: jax.Array) -> jax.Array:
    """Quaternion (w, x, y, z) -> rotation matrix (normalizes input)."""
    q = jnp.asarray(q)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def quaternion_from_rotation(R: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion (w, x, y, z); branch-free, batched."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate formulations; pick the numerically best per element
    qw = jnp.sqrt(jnp.maximum(1 + tr, 0)) / 2
    qx = jnp.sqrt(jnp.maximum(1 + m00 - m11 - m22, 0)) / 2
    qy = jnp.sqrt(jnp.maximum(1 - m00 + m11 - m22, 0)) / 2
    qz = jnp.sqrt(jnp.maximum(1 - m00 - m11 + m22, 0)) / 2
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qw, qx, qy, qz], -1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def transform_points(T: jax.Array, points: jax.Array) -> jax.Array:
    """Apply 4x4 transform to [N,3] points (reference:
    src/cupoch/geometry/geometry_utils.cu TransformPoints).

    HIGHEST precision: the TPU MXU's default bf16 passes would put
    ~1e-3 relative error on coordinates, which shifts correspondence
    distances by more than typical ICP thresholds."""
    return jnp.dot(points, T[:3, :3].T,
                   precision=jax.lax.Precision.HIGHEST) + T[:3, 3]


def rotate_normals(T_or_R: jax.Array, normals: jax.Array) -> jax.Array:
    R = T_or_R[..., :3, :3]
    return jnp.dot(normals, jnp.swapaxes(R, -1, -2),
                   precision=jax.lax.Precision.HIGHEST)
