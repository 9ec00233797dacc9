import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from cupoch_tpu.utility import transforms as tf
from cupoch_tpu.utility import eigen as ue


def random_rotations(rng, n=32):
    return Rotation.random(n, random_state=np.random.RandomState(0)).as_matrix().astype(np.float32)


def test_exp_log_so3_roundtrip(rng):
    w = rng.normal(size=(64, 3)).astype(np.float32)
    R = tf.exp_so3(jnp.asarray(w))
    w2 = np.asarray(tf.log_so3(R))
    # angle may wrap; compare rotations
    R2 = np.asarray(tf.exp_so3(jnp.asarray(w2)))
    np.testing.assert_allclose(np.asarray(R), R2, atol=2e-4)


def test_exp_so3_matches_scipy(rng):
    w = rng.normal(size=(16, 3)).astype(np.float32)
    R = np.asarray(tf.exp_so3(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_exp_log_se3_roundtrip(rng):
    xi = rng.normal(size=(32, 6)).astype(np.float32) * 0.5
    T = tf.exp_se3(jnp.asarray(xi))
    xi2 = np.asarray(tf.log_se3(T))
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_exp_se3_small_angle():
    xi = jnp.asarray([[1e-9, 0, 0, 1.0, 2.0, 3.0]], jnp.float32)
    T = np.asarray(tf.exp_se3(xi))[0]
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-6)


def test_inverse_transform(rng):
    xi = rng.normal(size=(8, 6)).astype(np.float32)
    T = tf.exp_se3(jnp.asarray(xi))
    Ti = tf.inverse_transform(T)
    eye = np.asarray(T @ Ti)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), eye.shape), atol=1e-5)


def test_quaternion_roundtrip(rng):
    R = random_rotations(rng)
    q = tf.quaternion_from_rotation(jnp.asarray(R))
    R2 = np.asarray(tf.rotation_from_quaternion(q))
    np.testing.assert_allclose(R, R2, atol=1e-5)


def test_euler_composition():
    a = jnp.asarray([0.1, -0.4, 0.7], jnp.float32)
    R = np.asarray(tf.rotation_from_euler("XYZ", a))
    R_ref = Rotation.from_euler("XYZ", np.asarray(a)).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)


def test_transform_vector6():
    x = jnp.asarray([0.1, 0.2, 0.3, 1.0, 2.0, 3.0], jnp.float32)
    T = np.asarray(tf.transform_vector6_to_matrix4(x))
    R_ref = (
        Rotation.from_euler("z", 0.3).as_matrix()
        @ Rotation.from_euler("y", 0.2).as_matrix()
        @ Rotation.from_euler("x", 0.1).as_matrix()
    )
    np.testing.assert_allclose(T[:3, :3], R_ref, atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-6)


def test_symeig3x3_matches_numpy(rng):
    A = rng.normal(size=(256, 3, 3)).astype(np.float32)
    A = A + np.swapaxes(A, -1, -2)
    vals, vecs = ue.symeig3x3(jnp.asarray(A))
    vals = np.asarray(vals)
    vecs = np.asarray(vecs)
    ref_vals = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(vals, ref_vals, atol=2e-3)
    # eigenvector property: A v = lambda v
    for i in range(3):
        Av = np.einsum("nij,nj->ni", A, vecs[:, :, i])
        lv = vals[:, i : i + 1] * vecs[:, :, i]
        np.testing.assert_allclose(Av, lv, atol=5e-3)


def test_symeig3x3_degenerate():
    A = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 2.0, (4, 3, 3))
    vals, vecs = ue.symeig3x3(A)
    np.testing.assert_allclose(np.asarray(vals), 2.0, atol=1e-6)
    # vecs orthonormal
    VtV = np.einsum("nij,nik->njk", np.asarray(vecs), np.asarray(vecs))
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)


def test_solve_psd():
    A = np.diag([4.0, 3.0, 2.0, 1.0, 5.0, 6.0]).astype(np.float32)
    b = np.arange(1, 7, dtype=np.float32)
    ok, x = ue.solve_linear_system_psd(jnp.asarray(A), jnp.asarray(b))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x), b / np.diag(A), atol=1e-5)


def test_solve_psd_singular():
    A = np.zeros((6, 6), np.float32)
    b = np.ones(6, np.float32)
    ok, x = ue.solve_linear_system_psd(jnp.asarray(A), jnp.asarray(b))
    assert not bool(ok)
    np.testing.assert_allclose(np.asarray(x), 0.0)


def test_compute_jtj_jtr():
    # linear residuals r_i = a_i . x0 - b_i with known JTJ
    rng = np.random.default_rng(0)
    a = rng.normal(size=(100, 6)).astype(np.float32)
    b = rng.normal(size=(100,)).astype(np.float32)

    def jac(row):
        return row[:6], row[:6] @ jnp.zeros(6) - row[6]

    data = jnp.concatenate([a, b[:, None]], -1)
    JTJ, JTr, r2, cnt = ue.compute_jtj_jtr(jac, data)
    np.testing.assert_allclose(np.asarray(JTJ), a.T @ a, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(JTr), a.T @ (-b), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(r2), float(b @ b), rtol=1e-4)
    assert int(cnt) == 100
