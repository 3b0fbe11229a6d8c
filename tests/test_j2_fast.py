"""The hand-optimized J2 kernel (ops/j2_fast.py) must match the generic IFT path
to 1e-8 — stress, state AND consistent tangent (the BASELINE.md parity bar)."""

import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material
from dolfinx_materials_tpu.models import (
    LinearElasticIsotropic,
    LinearHardening,
    VoceHardening,
    vonMisesIsotropicHardening,
)
from dolfinx_materials_tpu.ops.j2_fast import make_j2_batched_update

E, nu, sig0 = 70e3, 0.3, 350.0


def _compare(hardening, seed, prior_state=False):
    el = LinearElasticIsotropic(E, nu)
    beh = vonMisesIsotropicHardening(el, hardening)
    mat = Material(beh)
    assert mat._fast_update is not None, "fast path must be wired in"

    n = 64
    rng = np.random.default_rng(seed)
    # mix of elastic and plastic points (scales straddle the yield strain)
    eps = rng.normal(size=(n, 6)) * np.geomspace(1e-4, 5e-2, n)[:, None]
    mat.set_data_manager(n)
    if prior_state:
        ep0 = rng.normal(size=(n, 6)) * 1e-3
        ep0[:, :3] -= ep0[:, :3].mean(axis=1, keepdims=True)
        p0 = np.abs(rng.normal(size=n)) * 1e-3
        mat.data_manager.s0["eps_p"] = ep0
        mat.data_manager.s0["p"] = p0

    state0 = mat.data_manager.s0.internal
    eps = jnp.asarray(eps)
    # fast path (what integrate uses)
    sig_f, isv_f, Ct_f = mat.integrate(eps)
    # generic IFT path
    sig_g, Ct_g, new_g = mat.batched_constitutive_update(eps, {}, state0, 0.0)

    scale = float(jnp.max(jnp.abs(sig_g)))
    np.testing.assert_allclose(np.asarray(sig_f), np.asarray(sig_g), atol=1e-8 * scale)
    np.testing.assert_allclose(
        np.asarray(Ct_f), np.asarray(Ct_g).reshape(n, -1), atol=1e-7 * E
    )
    np.testing.assert_allclose(
        np.asarray(mat.data_manager.s1["p"]).ravel(),
        np.asarray(new_g["p"]),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(mat.data_manager.s1["eps_p"]),
        np.asarray(new_g["eps_p"]),
        atol=1e-12,
    )


def test_fast_matches_generic_linear():
    _compare(LinearHardening(sig0, 1000.0), 0)


def test_fast_matches_generic_voce():
    _compare(VoceHardening(sig0, 500.0, 1e3), 1)


def test_fast_matches_generic_with_prior_state():
    _compare(VoceHardening(sig0, 500.0, 1e3), 2, prior_state=True)


def test_fast_perfect_plasticity():
    _compare(LinearHardening(sig0, 0.0), 3)
