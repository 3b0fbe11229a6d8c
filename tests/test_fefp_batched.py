"""FeFp whole-batch feature-major fast path: parity vs the generic vmapped
path at 1e-8, including F = I degenerate points and committed multi-step
history, plus the series-envelope NaN guard.

Reference workload this accelerates: the 3D necking-rod FeFp demo
(reference demos/jax/finite_strain_elastoplasticity.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material
from dolfinx_materials_tpu.models import (
    FeFpJ2Plasticity,
    LinearElasticIsotropic,
    VoceHardening,
)
from dolfinx_materials_tpu.ops import tensors as tn
import pytest


def make_mat(**kw):
    return Material(
        FeFpJ2Plasticity(
            LinearElasticIsotropic(200e3, 0.3), VoceHardening(350.0, 500.0, 50.0),
            **kw,
        )
    )


def rand_Fv(rng, n, amp):
    F = np.tile(np.eye(3), (n, 1, 1)) + amp * rng.standard_normal((n, 3, 3))
    F[: n // 4] = np.eye(3)  # exact degenerate states
    return np.asarray(tn.mat_to_nonsym(jnp.asarray(F)))


@pytest.mark.slow
def test_fefp_batched_parity_two_steps():
    n = 48
    rng = np.random.default_rng(0)
    mat = make_mat()
    mat.set_data_manager(n)
    fast = mat._fast_update
    assert fast is not None
    mat._fast_update = None  # force the generic vmapped path in integrate()

    Fv = rand_Fv(rng, n, 0.02)
    for step in range(3):
        flux_g, _, Ct_g = mat.integrate(Fv)
        pk1_f, Ct_f, st_f = fast(
            jnp.asarray(Fv), mat.data_manager.s0.internal, 0.0
        )
        scale = float(jnp.max(jnp.abs(flux_g))) + 1.0
        np.testing.assert_allclose(pk1_f, flux_g, atol=1e-8 * scale)
        np.testing.assert_allclose(
            Ct_f, Ct_g, atol=1e-8 * float(jnp.max(jnp.abs(Ct_g)))
        )
        s1 = mat.data_manager.s1.internal
        np.testing.assert_allclose(st_f["be"], s1["be"], atol=1e-10)
        np.testing.assert_allclose(st_f["p"], s1["p"], atol=1e-10)
        assert step == 0 or float(jnp.max(s1["p"])) > 0  # plasticity exercised
        mat.data_manager.update()
        Fv = np.asarray(
            tn.mat_to_nonsym(
                tn.nonsym_to_mat(jnp.asarray(Fv))
                @ jnp.asarray(np.eye(3) + 0.01 * rng.standard_normal((n, 3, 3)))
            )
        )


@pytest.mark.slow
def test_fefp_flux_only_matches_and_skips_tangent():
    n = 16
    rng = np.random.default_rng(1)
    mat = make_mat()
    mat.set_data_manager(n)
    assert mat._fast_flux is not None
    Fv = rand_Fv(rng, n, 0.02)
    flux_full, _, _ = mat.integrate(Fv)
    flux_only, _ = mat.integrate_flux_only(Fv)
    np.testing.assert_allclose(flux_only, flux_full, rtol=1e-12, atol=1e-12)


def test_fefp_envelope_guard_poisons_with_nan():
    mat = make_mat()
    mat.set_data_manager(4)
    Fv = jnp.tile(3.0 * jnp.asarray(tn.I9), (4, 1))  # 3x stretch: out of envelope
    pk1, _, _ = mat._fast_update(Fv, mat.data_manager.s0.internal, 0.0)
    assert bool(jnp.all(jnp.isnan(pk1)))
    # in-envelope states stay finite
    Fv_ok = jnp.tile(1.1 * jnp.asarray(tn.I9), (4, 1))
    pk1_ok, _, _ = mat._fast_update(Fv_ok, mat.data_manager.s0.internal, 0.0)
    assert bool(jnp.all(jnp.isfinite(pk1_ok)))


def test_fefp_analytic_tangent_matches_jvp_two_steps():
    """Round-5 factored tangent (6 log-series seeds + Simo-Hughes closed form)
    vs the rounds-2-4 9-seed jvp tangent: machine-precision agreement on a
    mixed elastic/plastic batch, including exact F = I points and a second
    step from a committed plastic state."""
    n = 64
    rng = np.random.default_rng(3)
    beh = FeFpJ2Plasticity(
        LinearElasticIsotropic(200e3, 0.3), VoceHardening(350.0, 500.0, 50.0)
    )
    assert beh.tangent_mode == "analytic"  # the default Material.integrate uses
    st = {
        "be": jnp.tile(jnp.asarray(tn.I2), (n, 1)),
        "p": jnp.zeros(n),
        "F_prev": jnp.tile(jnp.asarray(tn.I9), (n, 1)),
    }
    Fv = jnp.asarray(rand_Fv(rng, n, 0.02))
    for _ in range(2):
        pk1_j, Ct_j, st_j = beh._batched_update_jvp(Fv, st, 0.0)
        pk1_a, Ct_a, st_a = beh._batched_update_analytic(Fv, st, 0.0)
        sc = float(jnp.max(jnp.abs(pk1_j)))
        np.testing.assert_allclose(pk1_a, pk1_j, atol=1e-12 * sc)
        np.testing.assert_allclose(
            Ct_a, Ct_j, atol=1e-12 * float(jnp.max(jnp.abs(Ct_j)))
        )
        for k in ("be", "p", "F_prev"):
            np.testing.assert_allclose(st_a[k], st_j[k], atol=1e-14)
        assert float(jnp.max(st_j["p"])) > 0  # plastic branch exercised
        st = st_j
        Fv = jnp.asarray(
            np.asarray(
                tn.mat_to_nonsym(
                    tn.nonsym_to_mat(Fv)
                    @ jnp.asarray(
                        np.eye(3) + 0.015 * rng.standard_normal((n, 3, 3))
                    )
                )
            )
        )


def test_fefp_fast_path_opt_out():
    mat = make_mat(use_batched_fast=False)
    assert mat._fast_update is None and mat._fast_flux is None
    mat.set_data_manager(2)
    Fv = rand_Fv(np.random.default_rng(2), 2, 0.01)
    flux, _, Ct = mat.integrate(Fv)
    assert flux.shape == (2, 9) and Ct.shape == (2, 81)
