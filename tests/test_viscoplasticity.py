"""Norton viscoplasticity and GSM integrator tests: same-discretization parity
against independent scalar/numpy backward-Euler references (the golden-file
pattern of tests/mfront/test_nonlinear_elasticity.py, without MTest)."""

import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material
from dolfinx_materials_tpu.models import (
    GeneralizedStandardMaterial,
    LinearElasticIsotropic,
    NortonViscoplasticity,
)
from dolfinx_materials_tpu.ops import tensors as tn

E, nu = 70e3, 0.3
mu = E / 2 / (1 + nu)


def test_norton_relaxation_vs_scalar_reference():
    """Pure-shear relaxation: hold strain, stress decays toward the threshold.

    Independent reference: scalar backward-Euler on q (von Mises stress), which is
    exact for this proportional loading — parity at 1e-9."""
    sig0, K, n_exp = 100.0, 200.0, 3.0
    mat = Material(
        NortonViscoplasticity(
            LinearElasticIsotropic(E, nu), lambda p: sig0, K=K, n=n_exp
        )
    )
    gam = 5e-3  # Mandel shear strain -> q_el = 3 mu gam / sqrt(... )
    eps = jnp.zeros((3, 6)).at[:, 3].set(gam)
    mat.set_data_manager(3)
    dt = 0.05
    nsteps = 40

    # scalar reference: backward Euler on p with residual
    # r(dp) = dp - dt ((q_el - 3 mu (p+dp) - sig0)/K)_+^n, solved by brentq
    from scipy.optimize import brentq

    C = np.asarray(tn.isotropic_C(E, nu))
    q_el = float(tn.eq_vm(jnp.asarray(C @ np.asarray(eps[0]))))
    p_ref = 0.0
    q_hist_ref = []
    for _ in range(nsteps):
        def r(dp):
            over = max((q_el - 3 * mu * (p_ref + dp) - sig0) / K, 0.0)
            return dp - dt * over**n_exp

        hi = max((q_el - sig0) / (3 * mu), 1e-12)
        dp = brentq(r, 0.0, hi, xtol=1e-16, rtol=1e-15)
        p_ref += dp
        q_hist_ref.append(q_el - 3 * mu * p_ref)

    q_hist = []
    for _ in range(nsteps):
        sig, _, Ct = mat.integrate(eps, dt)
        mat.data_manager.update()
        q_hist.append(float(tn.eq_vm(sig[0])))

    np.testing.assert_allclose(q_hist, q_hist_ref, rtol=1e-9)
    assert q_hist[-1] < q_hist[0]
    assert q_hist[-1] > sig0  # relaxes toward the threshold from above


def test_norton_elastic_below_threshold():
    sig0 = 1000.0
    mat = Material(
        NortonViscoplasticity(LinearElasticIsotropic(E, nu), lambda p: sig0, 100.0, 3.0)
    )
    eps = jnp.zeros((2, 6)).at[:, 0].set(1e-3)
    sig, _, Ct = mat.integrate(eps, dt=1.0)
    C = np.asarray(tn.isotropic_C(E, nu))
    np.testing.assert_allclose(np.asarray(sig), np.asarray(eps) @ C.T, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(Ct).reshape(2, 6, 6), np.broadcast_to(C, (2, 6, 6)), rtol=1e-8
    )


def test_gsm_linear_viscoelasticity():
    """GSM with quadratic psi/phi == standard linear solid; backward-Euler parity
    against the closed-form linear update, including consistent tangent."""
    C1 = np.asarray(tn.isotropic_C(E, nu))
    H = 0.3 * C1
    eta = 50.0

    def psi(eps, a):
        d = eps - a
        return 0.5 * d @ jnp.asarray(C1) @ d + 0.5 * a @ jnp.asarray(H) @ a

    def phi(adot):
        return 0.5 * eta * adot @ adot

    mat = Material(GeneralizedStandardMaterial(psi, phi, n_internal=6))
    rng = np.random.default_rng(0)
    eps = jnp.asarray(rng.normal(size=(4, 6)) * 1e-3)
    dt = 0.1

    # closed form: stationarity (C1+H+eta/dt I) a = C1 eps + eta/dt a0, a0=0
    A = C1 + H + eta / dt * np.eye(6)
    a = np.linalg.solve(A, (np.asarray(eps) @ C1.T).T).T
    sig_ref = (np.asarray(eps) - a) @ C1.T

    sig, isv, Ct = mat.integrate(eps, dt)
    np.testing.assert_allclose(np.asarray(sig), sig_ref, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(isv), a, rtol=1e-9)
    # consistent tangent: C1 - C1 A^{-1} C1
    Ct_ref = C1 - C1 @ np.linalg.solve(A, C1)
    np.testing.assert_allclose(
        np.asarray(Ct).reshape(4, 6, 6),
        np.broadcast_to(Ct_ref, (4, 6, 6)),
        rtol=1e-8,
    )
