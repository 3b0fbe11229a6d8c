"""Material-only unit tests for elasticity and J2 plasticity.

Pattern mirrors the reference's mesh-free batched material tests
(tests/test_FeFp_jax.py:6-33): drive ``material.integrate`` directly on a synthetic
Gauss-point batch over load steps and check closed-form values, invariants, and
finite-difference consistency of the tangents (the reference's 1e-8 parity bar,
BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dolfinx_materials_tpu import Material
from dolfinx_materials_tpu.models import (
    GeneralIsotropicHardening,
    LinearElasticIsotropic,
    LinearHardening,
    VoceHardening,
    vonMisesIsotropicHardening,
)
from dolfinx_materials_tpu.ops import tensors as tn

E, nu = 70e3, 0.3
mu = E / 2 / (1 + nu)
sig0 = 350.0


def test_linear_elasticity_batched():
    mat = Material(LinearElasticIsotropic(E, nu))
    rng = np.random.default_rng(0)
    eps = rng.normal(size=(16, 6)) * 1e-3
    sig, isv, Ct = mat.integrate(eps)
    C = np.asarray(tn.isotropic_C(E, nu))
    np.testing.assert_allclose(sig, eps @ C.T, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(Ct).reshape(-1, 6, 6), np.broadcast_to(C, (16, 6, 6)), rtol=1e-12
    )
    assert isv.shape == (16, 0)


def uniaxial_strain_path(mat, exx_max, nsteps, ncopy=4):
    """Drive eps = diag(exx, 0, 0) on a batch; returns stress history (nsteps, 6)."""
    mat.set_data_manager(ncopy)
    hist = []
    for t in np.linspace(0, 1, nsteps)[1:]:
        eps = np.zeros((ncopy, 6))
        eps[:, 0] = exx_max * t
        sig, isv, Ct = mat.integrate(jnp.asarray(eps))
        mat.data_manager.update()
        hist.append(np.asarray(sig[0]))
    return np.array(hist)


def test_j2_linear_hardening_closed_form():
    """Uniaxial-strain-driven J2 with linear hardening vs analytic solution."""
    H = 1000.0
    mat = Material(
        vonMisesIsotropicHardening(
            LinearElasticIsotropic(E, nu), LinearHardening(sig0, H)
        )
    )
    lmbda = E * nu / (1 + nu) / (1 - 2 * nu)
    exx = 0.02
    nsteps = 40
    hist = uniaxial_strain_path(mat, exx, nsteps)

    # elastic regime: sig = C @ eps
    e = exx / (nsteps - 1)
    np.testing.assert_allclose(hist[0, 0], (lmbda + 2 * mu) * e, rtol=1e-10)
    np.testing.assert_allclose(hist[0, 1], lmbda * e, rtol=1e-10)

    # plastic regime: von Mises stress equals hardening curve exactly
    sM = mat.data_manager.s0
    p_final = np.asarray(sM["p"]).ravel()[0]
    assert p_final > 0
    q = tn.eq_vm(jnp.asarray(hist[-1]))
    np.testing.assert_allclose(float(q), sig0 + H * p_final, rtol=1e-9)

    # plastic incompressibility
    eps_p = np.asarray(sM["eps_p"])[0]
    np.testing.assert_allclose(eps_p[0] + eps_p[1] + eps_p[2], 0.0, atol=1e-12)


def test_j2_voce_consistent_tangent_fd():
    """Consistent tangent (IFT path) vs central finite differences, deep in the
    plastic regime — the hard correctness bar for the implicit-diff machinery."""
    hard = VoceHardening(sig0, 500.0, 1e3)
    beh = vonMisesIsotropicHardening(LinearElasticIsotropic(E, nu), hard)
    mat = Material(beh)
    n = 8
    rng = np.random.default_rng(1)
    eps = rng.normal(size=(n, 6)) * 5e-2  # large strains -> plastic everywhere
    mat.set_data_manager(n)
    sig, isv, Ct = mat.integrate(jnp.asarray(eps))
    q = np.asarray(tn.eq_vm(jnp.asarray(sig)))
    p = np.asarray(mat.data_manager.s1["p"]).ravel()
    assert (p > 1e-4).all(), "test must probe the plastic branch"
    np.testing.assert_allclose(q, np.asarray(hard(jnp.asarray(p))), rtol=1e-9)

    Ct = np.asarray(Ct).reshape(n, 6, 6)
    h = 1e-6
    state0 = mat.data_manager.s0.internal
    for j in range(6):
        dp = np.zeros(6)
        dp[j] = h
        fp, _, _ = mat.batched_constitutive_update(
            jnp.asarray(eps + dp), {}, state0, 0.0
        )
        fm, _, _ = mat.batched_constitutive_update(
            jnp.asarray(eps - dp), {}, state0, 0.0
        )
        fd = (np.asarray(fp) - np.asarray(fm)) / (2 * h)
        np.testing.assert_allclose(Ct[:, :, j], fd, rtol=2e-5, atol=1e-3)


def test_general_matches_radial_return():
    """GeneralIsotropicHardening with the von Mises norm must reproduce the
    closed-form radial return to 1e-8 (stress AND tangent)."""
    hard = VoceHardening(sig0, 500.0, 1e3)
    el = LinearElasticIsotropic(E, nu)
    m_rr = Material(vonMisesIsotropicHardening(el, hard))
    m_gen = Material(GeneralIsotropicHardening(el, hard))
    rng = np.random.default_rng(2)
    eps = jnp.asarray(rng.normal(size=(12, 6)) * 3e-2)
    m_rr.set_data_manager(12)
    m_gen.set_data_manager(12)
    sig1, isv1, Ct1 = m_rr.integrate(eps)
    sig2, isv2, Ct2 = m_gen.integrate(eps)
    scale = float(jnp.max(jnp.abs(sig1)))
    np.testing.assert_allclose(sig2, sig1, atol=1e-8 * scale)
    np.testing.assert_allclose(Ct2, Ct1, atol=1e-6 * float(jnp.max(jnp.abs(Ct1))))
    np.testing.assert_allclose(
        np.asarray(m_gen.data_manager.s1["p"]),
        np.asarray(m_rr.data_manager.s1["p"]),
        atol=1e-10,
    )


def test_state_update_revert():
    """s0/s1 double-buffer semantics (reference: generic.py:204-216)."""
    mat = Material(
        vonMisesIsotropicHardening(
            LinearElasticIsotropic(E, nu), LinearHardening(sig0, 1000.0)
        )
    )
    mat.set_data_manager(4)
    eps = jnp.full((4, 6), 0.03) * jnp.asarray([1.0, -0.5, -0.5, 0, 0, 0])
    mat.integrate(eps)
    p1 = np.asarray(mat.data_manager.s1["p"])
    assert (p1 > 0).all()
    assert (np.asarray(mat.data_manager.s0["p"]) == 0).all()
    mat.data_manager.revert()
    assert (np.asarray(mat.data_manager.s1["p"]) == 0).all()
    mat.integrate(eps)
    mat.data_manager.update()
    np.testing.assert_allclose(np.asarray(mat.data_manager.s0["p"]), p1)


def test_elastic_branch_exact_tangent():
    """Below yield the consistent tangent must be exactly C (branch selection)."""
    mat = Material(
        vonMisesIsotropicHardening(
            LinearElasticIsotropic(E, nu), LinearHardening(sig0, 1000.0)
        )
    )
    eps = jnp.zeros((3, 6)).at[:, 0].set(1e-4)  # well below yield
    _, _, Ct = mat.integrate(eps)
    C = np.asarray(tn.isotropic_C(E, nu))
    np.testing.assert_allclose(
        np.asarray(Ct).reshape(3, 6, 6), np.broadcast_to(C, (3, 6, 6)), rtol=1e-10
    )
