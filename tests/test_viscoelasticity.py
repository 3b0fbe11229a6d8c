"""Bundled generalized-Maxwell viscoelasticity vs its closed forms.

The single-branch (Zener) case is the docs/custom_behaviors.md worked example
(reference extension-point substitute, mfront.py:41-343); here the bundled
multi-branch model is validated: step-strain relaxation is EXACTLY the Prony
series (the exponential integrator is exact for held strain), dt=0 is a fixed
point, and the algorithmic tangent matches its closed form.
"""

import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material
from dolfinx_materials_tpu.models import GeneralizedMaxwell, ZenerViscoelasticity
from dolfinx_materials_tpu.ops.tensors import I2

KAPPA, MU_INF = 1.2e3, 250.0
BRANCHES = [(400.0, 0.1), (300.0, 1.0), (150.0, 10.0)]


def make_mat(n=4):
    mat = Material(GeneralizedMaxwell(KAPPA, MU_INF, BRANCHES))
    mat.set_data_manager(n)
    return mat


def test_step_strain_relaxation_is_exact_prony_series():
    mat = make_mat()
    exx = 1.5e-3
    eps = jnp.tile(jnp.array([exx, 0, 0, 0, 0, 0.0]), (4, 1))
    flux, _, _ = mat.integrate(eps, dt=0.0)  # instantaneous (glassy) step
    mat.data_manager.update()
    dt = 0.05
    sig = [float(flux[0, 0])]
    for _ in range(40):
        flux, _, _ = mat.integrate(eps, dt=dt)
        mat.data_manager.update()
        sig.append(float(flux[0, 0]))
    ts = np.arange(41) * dt
    mu_t = MU_INF + sum(m * np.exp(-ts / tau) for m, tau in BRANCHES)
    # uniaxial strain: sig_xx(t) = kappa*exx + 2*mu(t)*(2/3)*exx
    analytic = (KAPPA + 4.0 / 3.0 * mu_t) * exx
    np.testing.assert_allclose(np.asarray(sig), analytic, rtol=1e-10)


def test_dt_zero_is_fixed_point():
    mat = make_mat()
    eps = jnp.tile(jnp.array([1e-3, -2e-4, 0, 3e-4, 0, 0.0]), (4, 1))
    f1, _, _ = mat.integrate(eps, dt=0.0)
    mat.data_manager.update()
    f2, _, _ = mat.integrate(eps, dt=0.0)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(mat.data_manager.s0["epsv"]), 0.0, atol=1e-14
    )


def test_tangent_closed_form():
    """Ct = kappa*IxI + 2*(mu_inf + sum mu_i exp(-dt/tau_i))*P_dev."""
    mat = make_mat()
    eps = jnp.tile(jnp.array([1e-3, 2e-4, -1e-4, 4e-4, 0, 0.0]), (4, 1))
    dt = 0.3
    _, _, Ct = mat.integrate(eps, dt=dt)
    Ct = np.asarray(Ct)[0].reshape(6, 6)
    IxI = np.outer(I2, I2)
    P_dev = np.eye(6) - IxI / 3.0
    mu_eff = MU_INF + sum(m * np.exp(-dt / tau) for m, tau in BRANCHES)
    np.testing.assert_allclose(
        Ct, KAPPA * IxI + 2 * mu_eff * P_dev, rtol=1e-12, atol=1e-9
    )


def test_zener_is_single_branch_generalized_maxwell():
    z = Material(ZenerViscoelasticity(KAPPA, MU_INF, 400.0, 0.1))
    g = Material(GeneralizedMaxwell(KAPPA, MU_INF, [(400.0, 0.1)]))
    for m in (z, g):
        m.set_data_manager(2)
    eps = jnp.tile(jnp.array([2e-3, -1e-3, 0, 5e-4, 0, 0.0]), (2, 1))
    fz, _, _ = z.integrate(eps, dt=0.07)
    fg, _, _ = g.integrate(eps, dt=0.07)
    np.testing.assert_allclose(np.asarray(fz), np.asarray(fg), atol=1e-14)


def test_glassy_and_relaxed_limits():
    beh = GeneralizedMaxwell(KAPPA, MU_INF, BRANCHES)
    assert float(beh.relaxation_shear_modulus(0.0)) == MU_INF + sum(
        m for m, _ in BRANCHES
    )
    assert abs(float(beh.relaxation_shear_modulus(1e9)) - MU_INF) < 1e-10
