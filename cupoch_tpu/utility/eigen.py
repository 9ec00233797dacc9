"""Gauss-Newton building blocks and small linear-algebra kernels.

TPU-native equivalents of the reference's device-side solvers
(src/cupoch/utility/eigen.h / eigen.inl):
  - ``compute_jtj_jtr``      ~ ComputeJTJandJTr (eigen.h:92-114): a fused
    J^T J / J^T r reduction over a per-row jacobian functor, expressed
    here as vmap + masked sum so XLA fuses the whole map-reduce.
  - ``solve_jacobian_system`` ~ SolveJacobianSystemAndObtainExtrinsicMatrix
    (eigen.h:83).
  - ``solve_linear_system_psd`` ~ SolveLinearSystemPSD (eigen.h:72).
  - ``symeig3x3``            ~ utility/eigenvalue.h FastEigen3x3 (closed
    form, batched; used by normal estimation / ISS / OBB).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from . import transforms


def compute_jtj_jtr(
    jac_res_fn: Callable[[jax.Array], Tuple[jax.Array, jax.Array]],
    data: jax.Array,
    mask: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused J^T J / J^T r reduction.

    ``jac_res_fn(row) -> (J_r [..., D], r [...])`` may return multiple
    residuals per row (stacked on a leading axis), matching the
    reference's ``NumJac`` template parameter. Returns
    (JTJ [D,D], JTr [D], r2_sum, count).
    """
    J, r = jax.vmap(jac_res_fn)(data)
    if J.ndim == 2:
        J = J[:, None, :]
        r = r[:, None]
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (r.ndim - 1)).astype(J.dtype)
        Jm = J * m[..., None]
        rm = r * m
    else:
        Jm, rm = J, r
    Jf = Jm.reshape(-1, J.shape[-1])
    rf = rm.reshape(-1)
    JTJ = jnp.matmul(Jf.T, Jf, precision=jax.lax.Precision.HIGHEST)
    JTr = jnp.matmul(Jf.T, rf, precision=jax.lax.Precision.HIGHEST)
    r2 = jnp.sum(rf * rf)
    count = (jnp.sum(mask) * r.shape[-1]) if mask is not None else rf.shape[0]
    return JTJ, JTr, r2, count


def _chol_solve_unrolled(A: jax.Array, b: jax.Array):
    """Fully-unrolled scalar Cholesky solve for tiny systems.

    The general `jnp.linalg.cholesky` + `cho_solve` + `det` chain
    lowers to three separate factorization HLOs — measurable per-ICP-
    iteration overhead inside a fused while_loop on TPU. Unrolling the
    n<=8 case into plain scalar arithmetic lets XLA fuse the whole
    solve, and |det A| = prod(diag L)^2 falls out for free.

    Returns (x [n], det_A) with NaNs when A is not positive definite
    (caller's finiteness check handles the fallback)."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    det_sqrt = L[0][0]
    for i in range(1, n):
        det_sqrt = det_sqrt * L[i][i]
    return jnp.stack(x), det_sqrt * det_sqrt


def solve_linear_system_psd(
    A: jax.Array,
    b: jax.Array,
    check_det: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Solve A x = b for PSD A via Cholesky; returns (ok, x).

    Mirrors SolveLinearSystemPSD (reference eigen.h:72) which falls back
    to zero motion when the system is degenerate.
    """
    dtype = A.dtype
    if A.ndim == 2 and A.shape[-1] <= 8:
        x, det = _chol_solve_unrolled(A, b)
        ok = jnp.all(jnp.isfinite(x))
        if check_det:
            ok = jnp.logical_and(
                ok, jnp.abs(det) > jnp.asarray(1e-12, dtype))
        x = jnp.where(ok, x, jnp.zeros_like(x))
        return ok, x
    L, ok_chol = _cholesky_with_status(A)
    x = jax.scipy.linalg.cho_solve((L, True), b)
    finite = jnp.all(jnp.isfinite(x))
    ok = jnp.logical_and(ok_chol, finite)
    if check_det:
        det = jnp.linalg.det(A)
        ok = jnp.logical_and(ok, jnp.abs(det) > jnp.asarray(1e-12, dtype))
    x = jnp.where(ok, x, jnp.zeros_like(x))
    return ok, x


def _cholesky_with_status(A: jax.Array):
    L = jnp.linalg.cholesky(A)
    ok = jnp.all(jnp.isfinite(L))
    L = jnp.where(ok, L, jnp.eye(A.shape[-1], dtype=A.dtype))
    return L, ok


def solve_jacobian_system(
    JTJ: jax.Array, JTr: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """6x6 GN step -> (ok, 4x4 extrinsic), solving JTJ dx = -JTr and
    composing via the Euler-angle convention used by the reference
    (eigen.h:83 + TransformVector6fToMatrix4f)."""
    ok, x = solve_linear_system_psd(JTJ, -JTr)
    T = transforms.transform_vector6_to_matrix4(x)
    T = jnp.where(ok, T, jnp.eye(4, dtype=T.dtype))
    return ok, T


def symeig3x3(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Closed-form eigendecomposition of symmetric 3x3 matrices.

    Batched on leading dims. Returns (eigvals ascending [...,3],
    eigvecs [...,3,3] with eigvecs[...,:,i] the i-th eigenvector).
    Trigonometric eigenvalue formula + cross-product eigenvectors; this
    replaces the reference's FastEigen3x3 (utility/eigenvalue.h) and is
    fully vectorizable on the VPU (no iteration, no host sync).
    """
    dtype = A.dtype
    eps = jnp.asarray(1e-12, dtype)
    q = (A[..., 0, 0] + A[..., 1, 1] + A[..., 2, 2]) / 3.0
    eye = jnp.eye(3, dtype=dtype)
    B = A - q[..., None, None] * eye
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, eps))
    detB = jnp.linalg.det(B)
    r = jnp.clip(detB / (2.0 * jnp.maximum(p, eps) ** 3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    # handle (near-)isotropic matrices
    iso = p2 < eps
    vals = jnp.stack([e3, e2, e1], -1)  # ascending
    vals = jnp.where(iso[..., None], jnp.stack([q, q, q], -1), vals)

    def eigvec(lam):
        M = A - lam[..., None, None] * eye
        r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, -1)
        n02 = jnp.sum(c02 * c02, -1)
        n12 = jnp.sum(c12 * c12, -1)
        best = jnp.argmax(jnp.stack([n01, n02, n12], -1), -1)
        v = jnp.take_along_axis(
            jnp.stack([c01, c02, c12], -2), best[..., None, None], axis=-2
        )[..., 0, :]
        norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype), v.shape)
        return jnp.where(norm > eps, v / jnp.maximum(norm, eps), fallback)

    v0 = eigvec(vals[..., 0])
    v2 = eigvec(vals[..., 2])
    # enforce orthogonality: v1 = v2 x v0
    v2 = v2 - jnp.sum(v2 * v0, -1, keepdims=True) * v0
    v2n = jnp.linalg.norm(v2, axis=-1, keepdims=True)
    alt = _any_orthonormal(v0)
    v2 = jnp.where(v2n > eps, v2 / jnp.maximum(v2n, eps), alt)
    v1 = jnp.cross(v2, v0)
    vecs = jnp.stack([v0, v1, v2], -1)
    iso_vecs = jnp.broadcast_to(eye, vecs.shape)
    vecs = jnp.where(iso[..., None, None], iso_vecs, vecs)
    return vals, vecs


def _any_orthonormal(v: jax.Array) -> jax.Array:
    """A unit vector orthogonal to unit v (branch-free)."""
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], v.dtype), v.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], v.dtype), v.shape)
    use_ey = jnp.abs(v[..., 0:1]) > 0.9
    a = jnp.where(use_ey, ey, ex)
    w = jnp.cross(v, a)
    return w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)


def sqrtm_psd3(A: jax.Array) -> jax.Array:
    """Symmetric square root of batched PSD 3x3 matrices
    (reference: utility/eigenvalue.h:33 SqrtMatrix3x3)."""
    vals, vecs = symeig3x3(A)
    s = jnp.sqrt(jnp.maximum(vals, 0.0))
    return jnp.einsum("...ij,...j,...kj->...ik", vecs, s, vecs,
                      precision=jax.lax.Precision.HIGHEST)


def rotation_e1_to_x(x: jax.Array) -> jax.Array:
    """Rotation matrices taking e1=(1,0,0) to unit vectors x [...,3]
    (reference: generalized_icp.cu:18-30 GetRotationFromE1ToX)."""
    e1 = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], x.dtype), x.shape)
    v = jnp.cross(e1, x)
    c = x[..., 0]  # e1 . x
    eye = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), x.shape[:-1] + (3, 3))
    # antiparallel: any 180-degree rotation about an axis orthogonal to e1
    flip = jnp.broadcast_to(
        jnp.asarray([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]], x.dtype),
        eye.shape)
    a, b, cc = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(a)
    sv = jnp.stack([
        jnp.stack([zero, -cc, b], -1),
        jnp.stack([cc, zero, -a], -1),
        jnp.stack([-b, a, zero], -1),
    ], -2)
    factor = 1.0 / jnp.maximum(1.0 + c, 1e-8)
    sv2 = jnp.matmul(sv, sv, precision=jax.lax.Precision.HIGHEST)
    R = eye + sv + sv2 * factor[..., None, None]
    antiparallel = c < -1.0 + 1e-6
    return jnp.where(antiparallel[..., None, None], flip, R)
