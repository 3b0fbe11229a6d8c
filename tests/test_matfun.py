"""Differentiable matrix-function toolkit vs scipy, including the degenerate
(eigenvalue-coincident) points where eigh-based AD would NaN."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from dolfinx_materials_tpu.ops import matfun
import pytest


def rand_spd(rng, spread=2.0):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    lam = np.exp(rng.uniform(-spread, spread, size=3))
    return (Q * lam) @ Q.T


def test_sqrtm_logm_expm_vs_scipy():
    rng = np.random.default_rng(0)
    for _ in range(10):
        X = rand_spd(rng)
        np.testing.assert_allclose(
            matfun.sqrtm(jnp.asarray(X)), scipy.linalg.sqrtm(X), rtol=1e-11, atol=1e-12
        )
        np.testing.assert_allclose(
            matfun.logm(jnp.asarray(X)), scipy.linalg.logm(X), rtol=1e-10, atol=1e-11
        )
        L = scipy.linalg.logm(X)
        np.testing.assert_allclose(
            matfun.expm(jnp.asarray(L)), X, rtol=1e-10, atol=1e-12
        )


def test_powm():
    rng = np.random.default_rng(1)
    X = rand_spd(rng, spread=1.5)
    a = 14.4  # Ogden alpha/2 regime
    w, V = np.linalg.eigh(X)
    expected = (V * w**a) @ V.T
    np.testing.assert_allclose(matfun.powm(jnp.asarray(X), a), expected, rtol=1e-9)
    np.testing.assert_allclose(
        matfun.tr_powm(jnp.asarray(X), a), np.sum(w**a), rtol=1e-9
    )


def test_identity_and_near_identity():
    I = jnp.eye(3)
    np.testing.assert_allclose(matfun.logm(I), np.zeros((3, 3)), atol=1e-14)
    np.testing.assert_allclose(matfun.sqrtm(I), np.eye(3), atol=1e-14)
    X = I * 1.0 + 1e-8 * jnp.asarray([[1.0, 2, 0], [2, -1, 0], [0, 0, 0.5]])
    np.testing.assert_allclose(
        matfun.logm(X), scipy.linalg.logm(np.asarray(X)), atol=1e-13
    )


@pytest.mark.slow
def test_grad_at_coincident_eigenvalues():
    """d tr(log(C)) / dC = C^{-1}; must hold AT C = c*I (eigh AD would NaN here)."""

    def f(C):
        return jnp.trace(matfun.logm(C))

    C = 2.0 * jnp.eye(3)
    g = jax.grad(f)(C)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(g, np.linalg.inv(np.asarray(C)), rtol=1e-9)

    # second derivative (consistent-tangent path) also finite
    H = jax.jacfwd(jax.grad(f))(C)
    assert np.isfinite(np.asarray(H)).all()


def test_grad_generic_point_vs_eigh_formula():
    rng = np.random.default_rng(2)
    X = rand_spd(rng, spread=1.0)

    def f(C):
        return matfun.tr_powm(C, 3.7)

    g = jax.grad(f)(jnp.asarray(X))
    # analytic: d tr(C^a)/dC = a C^(a-1)
    w, V = np.linalg.eigh(X)
    expected = 3.7 * (V * w**2.7) @ V.T
    np.testing.assert_allclose(g, expected, rtol=1e-8)


def test_batched():
    rng = np.random.default_rng(3)
    Xs = np.stack([rand_spd(rng) for _ in range(5)])
    out = matfun.logm(jnp.asarray(Xs))
    for i in range(5):
        np.testing.assert_allclose(out[i], scipy.linalg.logm(Xs[i]), rtol=1e-10, atol=1e-11)
