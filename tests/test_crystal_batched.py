"""Crystal-plasticity whole-batch feature-major fast path: parity vs the
generic vmapped per-point IFT path over a multi-step loading history (stress,
consistent tangent, all four ISVs), plus the flux-only companion.

This is the 12-unknown-per-point half of VERDICT r1 item 7 (the FeFp half is
tests/test_fefp_batched.py). Reference workload: the Meric-Cailletaud MFront
behavior driven by tests/mfront/test_elastoplasticity.py:39-62."""

import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material
from dolfinx_materials_tpu.models import MericCailletaudCrystalPlasticity


def make_mat(**kw):
    return Material(MericCailletaudCrystalPlasticity(**kw))


def rand_eps(rng, n, amp):
    e = amp * rng.standard_normal((n, 6))
    e[: n // 4] = 0.0  # stress-free points exercise the elastic branch
    return e


def test_crystal_batched_parity_three_steps():
    n = 24
    rng = np.random.default_rng(0)
    mat = make_mat()
    mat.set_data_manager(n)
    fast = mat._fast_update
    assert fast is not None
    mat._fast_update = None  # route integrate() through the generic path

    dt = 1e-2
    eps = rand_eps(rng, n, 2e-3)
    for step in range(3):
        flux_g, _, Ct_g = mat.integrate(eps, dt=dt)
        sig_f, Ct_f, st_f = fast(
            jnp.asarray(eps), mat.data_manager.s0.internal, dt
        )
        scale = float(jnp.max(jnp.abs(flux_g))) + 1.0
        np.testing.assert_allclose(sig_f, flux_g, atol=2e-7 * scale)
        np.testing.assert_allclose(
            Ct_f, Ct_g, atol=1e-6 * float(jnp.max(jnp.abs(Ct_g)))
        )
        s1 = mat.data_manager.s1.internal
        for k in ("eps_p", "g", "p", "a"):
            np.testing.assert_allclose(
                st_f[k], s1[k], atol=1e-9 * (1.0 + float(jnp.max(jnp.abs(s1[k]))))
            )
        mat.data_manager.update()
        eps = eps + rand_eps(rng, n, 1e-3)
    assert float(jnp.max(s1["p"])) > 1e-4, "plastic slip must develop"


def test_crystal_flux_only_matches():
    n = 8
    rng = np.random.default_rng(1)
    mat = make_mat()
    mat.set_data_manager(n)
    assert mat._fast_flux is not None
    eps = rand_eps(rng, n, 2e-3)
    flux_full, _, _ = mat.integrate(eps, dt=1e-2)
    flux_only, _ = mat.integrate_flux_only(eps, dt=1e-2)
    np.testing.assert_allclose(flux_only, flux_full, rtol=1e-10, atol=1e-10)


def test_crystal_fast_path_opt_out():
    mat = make_mat(use_batched_fast=False)
    assert mat._fast_update is None and mat._fast_flux is None
