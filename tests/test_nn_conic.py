"""NN surrogate behavior (train to elasticity, use with exact AD tangents) and
smoothed conic yield surfaces (Rankine/L1Rankine/Hosford) — the reference's
NN-surrogate design point (docs/jax.md:36-44) and cvxpy demo surfaces
(demos/cvxpy/cvxpy_materials.py:54-110)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dolfinx_materials_tpu import Material
from dolfinx_materials_tpu.models import (
    HosfordPlasticity,
    L1RankinePlasticity,
    LinearElasticIsotropic,
    LinearHardening,
    NeuralBehavior,
    RankinePlasticity,
    vonMisesIsotropicHardening,
)
from dolfinx_materials_tpu.ops import tensors as tn

E, nu, sig0 = 70e3, 0.3, 100.0


def test_neural_surrogate_learns_elasticity():
    el = LinearElasticIsotropic(E, nu)
    rng = np.random.default_rng(0)
    eps = rng.normal(size=(512, 6)) * 1e-3
    C = np.asarray(tn.isotropic_C(E, nu))
    sig = eps @ C.T

    beh = NeuralBehavior(layers=(6, 32, 32, 6), input_scale=1e3, output_scale=100.0)
    hist = beh.fit(eps, sig, steps=4000, learning_rate=3e-3)
    assert hist[-1] < hist[0] * 1e-3, "training must reduce loss by 1000x"

    mat = Material(beh)
    eps_test = jnp.asarray(rng.normal(size=(16, 6)) * 1e-3)
    sig_pred, _, Ct = mat.integrate(eps_test)
    sig_ref = np.asarray(eps_test) @ C.T
    err = np.linalg.norm(np.asarray(sig_pred) - sig_ref) / np.linalg.norm(sig_ref)
    assert err < 0.08, f"surrogate relative error {err:.3f}"
    # tangents from AD are finite and roughly C
    Ct = np.asarray(Ct).reshape(16, 6, 6)
    assert np.isfinite(Ct).all()
    assert np.linalg.norm(Ct.mean(axis=0) - C) / np.linalg.norm(C) < 0.25


@pytest.mark.parametrize(
    "cls,kw",
    [
        (RankinePlasticity, {}),
        (L1RankinePlasticity, {}),
        (HosfordPlasticity, {"a": 8.0}),
    ],
)
def test_conic_surfaces_uniaxial(cls, kw):
    """Uniaxial tension: all three surfaces predict yield onset at sig_xx ~ sig0
    (for uniaxial stress, lambda_max = sum|lambda| = hosford = sig_xx)."""
    el = LinearElasticIsotropic(E, nu)
    beh = cls(el, LinearHardening(sig0, 0.0), **kw)
    mat = Material(beh)
    n = 8
    mat.set_data_manager(n)
    # drive uniaxial STRESS via strain eps = C^-1 sig with sig = diag(s,0,0)
    C = np.asarray(tn.isotropic_C(E, nu))
    s_targets = np.linspace(0.2, 0.95, n) * sig0
    eps_el = np.linalg.solve(C, np.stack([[s, 0, 0, 0, 0, 0] for s in s_targets], 0).T).T
    sig, _, Ct = mat.integrate(jnp.asarray(eps_el))
    # below yield: exact elastic response
    np.testing.assert_allclose(np.asarray(sig)[:, 0], s_targets, rtol=1e-6)
    assert float(jnp.max(mat.data_manager.s1["p"])) < 1e-10

    # beyond yield: stress stays near the surface (perfect plasticity)
    mat.data_manager.revert()
    big = jnp.asarray(eps_el * 3.0)
    sig2, _, _ = mat.integrate(big)
    p = np.asarray(mat.data_manager.s1["p"]).ravel()
    assert p[-1] > 1e-5
    lam = np.linalg.eigvalsh(np.asarray(tn.sym_to_mat(sig2[-1])))
    if cls is RankinePlasticity:
        f = lam.max()
    elif cls is L1RankinePlasticity:
        f = np.abs(lam).sum()
    else:
        a = kw["a"]
        f = (0.5 * (abs(lam[0] - lam[1]) ** a + abs(lam[1] - lam[2]) ** a
                    + abs(lam[0] - lam[2]) ** a)) ** (1 / a)
    np.testing.assert_allclose(f, sig0, rtol=2e-2)


@pytest.mark.slow
def test_hosford_high_exponent_close_to_tresca_point():
    """Pure shear: Hosford with large a approaches Tresca (yield at sig0/2 shear),
    von Mises yields at sig0/sqrt(3) — the surfaces genuinely differ."""
    el = LinearElasticIsotropic(E, nu)
    hos = Material(HosfordPlasticity(el, LinearHardening(sig0, 0.0), a=40.0))
    vm = Material(vonMisesIsotropicHardening(el, LinearHardening(sig0, 0.0)))
    gam = 3 * sig0 / E  # deep plastic shear
    eps = jnp.zeros((2, 6)).at[:, 3].set(gam)
    sig_h, _, _ = hos.integrate(eps)
    sig_v, _, _ = vm.integrate(eps)
    tau_h = float(sig_h[0, 3]) / np.sqrt(2)
    tau_v = float(sig_v[0, 3]) / np.sqrt(2)
    np.testing.assert_allclose(tau_v, sig0 / np.sqrt(3), rtol=1e-3)
    np.testing.assert_allclose(tau_h, sig0 / 2, rtol=5e-2)
    assert tau_h < tau_v
