"""Unit tests of the Mandel-convention kernel library (ops/tensors.py).

Mirrors the conventions of the reference's UFL converters
(dolfinx_materials/utils.py:146-212); factor bugs here are the classic failure
mode (SURVEY.md §7), so everything is checked to 1e-12.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dolfinx_materials_tpu.ops import tensors as tn


def rand_sym(rng, batch=()):
    A = rng.normal(size=batch + (3, 3))
    return 0.5 * (A + np.swapaxes(A, -1, -2))


def test_sym_roundtrip():
    rng = np.random.default_rng(0)
    S = rand_sym(rng, (5,))
    v = tn.mat_to_sym(jnp.asarray(S))
    assert v.shape == (5, 6)
    np.testing.assert_allclose(tn.sym_to_mat(v), S, atol=1e-14)
    # Mandel ordering and sqrt(2) factors per utils.py:146-165
    np.testing.assert_allclose(v[:, 3], np.sqrt(2) * S[:, 0, 1], atol=1e-14)
    np.testing.assert_allclose(v[:, 4], np.sqrt(2) * S[:, 0, 2], atol=1e-14)
    np.testing.assert_allclose(v[:, 5], np.sqrt(2) * S[:, 1, 2], atol=1e-14)


def test_nonsym_roundtrip():
    rng = np.random.default_rng(1)
    T = rng.normal(size=(4, 3, 3))
    v = tn.mat_to_nonsym(jnp.asarray(T))
    np.testing.assert_allclose(tn.nonsym_to_mat(v), T, atol=1e-14)
    # ordering [11,22,33,12,21,13,31,23,32] per utils.py:168-190
    np.testing.assert_allclose(v[:, 3], T[:, 0, 1], atol=1e-14)
    np.testing.assert_allclose(v[:, 4], T[:, 1, 0], atol=1e-14)
    np.testing.assert_allclose(
        tn.transpose9(v), tn.mat_to_nonsym(np.swapaxes(T, -1, -2)), atol=1e-14
    )


def test_ddot_is_frobenius():
    rng = np.random.default_rng(2)
    A, B = rand_sym(rng), rand_sym(rng)
    a, b = tn.mat_to_sym(jnp.asarray(A)), tn.mat_to_sym(jnp.asarray(B))
    np.testing.assert_allclose(tn.ddot(a, b), np.sum(A * B), rtol=1e-13)


def test_dev_tr_vm():
    rng = np.random.default_rng(3)
    A = rand_sym(rng)
    a = tn.mat_to_sym(jnp.asarray(A))
    np.testing.assert_allclose(tn.tr(a), np.trace(A), rtol=1e-13)
    d = tn.dev(a)
    np.testing.assert_allclose(tn.tr(d), 0.0, atol=1e-13)
    S = A - np.trace(A) / 3 * np.eye(3)
    np.testing.assert_allclose(
        tn.eq_vm(a), np.sqrt(1.5 * np.sum(S * S)), rtol=1e-13
    )


def test_rotation_operator_mandel6():
    rng = np.random.default_rng(4)
    # random rotation via QR
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    A = rand_sym(rng)
    R6 = tn.rotation_to_mandel6(jnp.asarray(Q))
    rotated = tn.sym_to_mat(R6 @ tn.mat_to_sym(jnp.asarray(A)))
    np.testing.assert_allclose(rotated, Q @ A @ Q.T, atol=1e-12)
    # isometry: R6 is orthogonal
    np.testing.assert_allclose(R6 @ R6.T, np.eye(6), atol=1e-12)


def test_rotation_operator_9():
    rng = np.random.default_rng(5)
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    T = rng.normal(size=(3, 3))
    R9 = tn.rotation_to_9(jnp.asarray(Q))
    rotated = tn.nonsym_to_mat(R9 @ tn.mat_to_nonsym(jnp.asarray(T)))
    np.testing.assert_allclose(rotated, Q @ T @ Q.T, atol=1e-12)


def test_det_inv():
    rng = np.random.default_rng(6)
    T = rng.normal(size=(7, 3, 3)) + 3 * np.eye(3)
    np.testing.assert_allclose(tn.det33(jnp.asarray(T)), np.linalg.det(T), rtol=1e-10)
    np.testing.assert_allclose(tn.inv33(jnp.asarray(T)), np.linalg.inv(T), rtol=1e-9)


def test_eigvals33_smooth():
    import jax

    rng = np.random.default_rng(8)
    # generic matrices: match numpy eigvalsh to 1e-10
    for _ in range(10):
        S = rand_sym(rng)
        lam = tn.eigvals33_smooth(jnp.asarray(S))
        np.testing.assert_allclose(lam, np.linalg.eigvalsh(S), rtol=1e-9, atol=1e-10)
    # degenerate spectra: exact values, FINITE gradients (eigvalsh AD NaNs here)
    for S in [2.0 * np.eye(3), np.diag([5.0, 5.0, 1.0]), np.zeros((3, 3))]:
        lam = tn.eigvals33_smooth(jnp.asarray(S))
        np.testing.assert_allclose(lam, np.linalg.eigvalsh(S), atol=1e-5)
        g = jax.jacrev(lambda M: tn.eigvals33_smooth(M).sum())(jnp.asarray(S))
        assert np.isfinite(np.asarray(g)).all()
        # d(sum lam)/dS = I exactly (trace invariant)
        np.testing.assert_allclose(np.asarray(g), np.eye(3), atol=1e-6)


def test_isotropic_C():
    E, nu = 70e3, 0.3
    lmbda = E * nu / (1 + nu) / (1 - 2 * nu)
    mu = E / 2 / (1 + nu)
    C = np.asarray(tn.isotropic_C(E, nu))
    # reference formula: python_materials/elasticity.py:14-19
    expected = 2 * mu * np.eye(6)
    expected[:3, :3] += lmbda
    np.testing.assert_allclose(C, expected, rtol=1e-14)
    # sigma = C eps reproduces lambda tr(eps) I + 2 mu eps for a random eps
    rng = np.random.default_rng(7)
    eps = tn.mat_to_sym(jnp.asarray(rand_sym(rng)))
    sig = C @ np.asarray(eps)
    E3 = np.asarray(tn.sym_to_mat(eps))
    expected_sig = lmbda * np.trace(E3) * np.eye(3) + 2 * mu * E3
    np.testing.assert_allclose(np.asarray(tn.sym_to_mat(jnp.asarray(sig))), expected_sig, rtol=1e-12)
