"""Ramberg-Osgood uniaxial FEM run vs an independent scipy material-point solve
(the reference's golden-CSV cross-solver pattern,
tests/mfront/test_nonlinear_elasticity.py:36-51, rtol 1e-4 — we hold 1e-6)."""

import numpy as np
from scipy.optimize import brentq, fsolve

from dolfinx_materials_tpu import Material
from dolfinx_materials_tpu.models import RambergOsgoodNonLinearElasticity
from uniaxial_tension import uniaxial_tension_2D

E = 100e3
nu = 0.3
sig0 = 500.0
alpha = 2e-3 * E / sig0
n = 100.0


def scipy_plane_strain_uniaxial(exx):
    """Independent reference: solve for eyy such that syy = 0 under the
    Ramberg-Osgood relation (plane strain, ezz = 0), pure numpy/scipy."""
    mu = E / 2 / (1 + nu)
    K = E / 3 / (1 - 2 * nu)
    beta = alpha * sig0 / E

    def stress(eps):
        e = eps - eps[:3].mean() * np.array([1.0, 1, 1, 0, 0, 0])
        eps_eq = np.sqrt(2 / 3 * np.dot(e, e))
        if eps_eq < 1e-14:
            return K * eps[:3].sum() * np.array([1.0, 1, 1, 0, 0, 0])
        f = lambda s: s / (3 * mu) + beta * (s / sig0) ** n - eps_eq
        s_eq = brentq(f, 0.0, 3 * mu * eps_eq + 1.0, xtol=1e-14)
        return K * eps[:3].sum() * np.array([1.0, 1, 1, 0, 0, 0]) + s_eq * (
            2 / 3
        ) * e / eps_eq

    def syy(eyy):
        eps = np.array([exx, float(np.atleast_1d(eyy)[0]), 0.0, 0, 0, 0])
        return stress(eps)[1]

    eyy = fsolve(syy, -nu * exx, xtol=1e-13)[0]
    return stress(np.array([exx, eyy, 0.0, 0, 0, 0]))


def test_ramberg_osgood_vs_scipy():
    mat = Material(
        RambergOsgoodNonLinearElasticity(E=E, nu=nu, sig0=sig0, alpha=alpha, n=n)
    )
    N = 10
    Exx = np.linspace(0, 1e-2, N + 1)
    Stress, _, _ = uniaxial_tension_2D(mat, Exx, N=1, order=1)
    for i, exx in enumerate(Exx[1:], start=1):
        sig_ref = scipy_plane_strain_uniaxial(exx)
        np.testing.assert_allclose(
            Stress[i], sig_ref, rtol=1e-6, atol=1e-6 * sig0
        )
    # plateau: the stress saturates near sig0 scale at large strain (n = 100)
    assert abs(Stress[-1][0]) < 1.3 * sig0 * 2 / np.sqrt(3) * 1.1
