"""Pallas fused J2 kernel (interpret mode on CPU) vs the jnp fast path: stress,
tangent and state must match to f32 precision."""

import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu.models import LinearElasticIsotropic, VoceHardening
from dolfinx_materials_tpu.ops.j2_fast import make_j2_batched_update
from dolfinx_materials_tpu.ops.pallas_j2 import (
    from_feature_major,
    make_j2_pallas_update,
    to_feature_major,
)

E, nu, sig0 = 70e3, 0.3, 350.0


def test_pallas_kernel_matches_fast_path():
    el = LinearElasticIsotropic(E, nu)
    hard = VoceHardening(sig0, 500.0, 1e3)
    ref = make_j2_batched_update(el, hard)
    pk = make_j2_pallas_update(el, hard, tile=128, interpret=True)

    n = 512
    rng = np.random.default_rng(0)
    eps = (rng.normal(size=(n, 6)) * np.geomspace(1e-4, 4e-2, n)[:, None]).astype(
        np.float32
    )
    eps_p = np.zeros((n, 6), np.float32)
    p = np.zeros(n, np.float32)

    sig_ref, Ct_ref, st_ref = ref(
        jnp.asarray(eps), {"eps_p": jnp.asarray(eps_p), "p": jnp.asarray(p)}, 0.0
    )

    eps_T, eps_p_T, p_row = to_feature_major(
        jnp.asarray(eps), jnp.asarray(eps_p), jnp.asarray(p)
    )
    sig, Ct, eps_p_new, p_new = from_feature_major(*pk(eps_T, eps_p_T, p_row))

    scale = float(jnp.max(jnp.abs(sig_ref)))
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref), atol=2e-4 * scale)
    np.testing.assert_allclose(
        np.asarray(Ct), np.asarray(Ct_ref), atol=5e-4 * E
    )
    np.testing.assert_allclose(
        np.asarray(p_new), np.asarray(st_ref["p"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(eps_p_new), np.asarray(st_ref["eps_p"]), atol=1e-6
    )
    assert np.asarray(p_new).max() > 1e-3, "must exercise the plastic branch"


def test_pallas_factored_kernel_matches():
    """Factored tangent (sig + [2*mu*beta, gamma]) expands to the exact Ct."""
    from dolfinx_materials_tpu.ops.pallas_j2 import (
        expand_factored_tangent,
        make_j2_pallas_factored,
    )

    el = LinearElasticIsotropic(E, nu)
    hard = VoceHardening(sig0, 500.0, 1e3)
    ref = make_j2_batched_update(el, hard)
    pk = make_j2_pallas_factored(el, hard, tile=128, interpret=True)

    n = 512
    rng = np.random.default_rng(1)
    eps = (rng.normal(size=(n, 6)) * np.geomspace(1e-4, 4e-2, n)[:, None]).astype(
        np.float32
    )
    eps_p = np.zeros((n, 6), np.float32)
    p = np.zeros(n, np.float32)

    sig_ref, Ct_ref, st_ref = ref(
        jnp.asarray(eps), {"eps_p": jnp.asarray(eps_p), "p": jnp.asarray(p)}, 0.0
    )
    eps_T, eps_p_T, p_row = to_feature_major(
        jnp.asarray(eps), jnp.asarray(eps_p), jnp.asarray(p)
    )
    sig_T, fac, eps_p_T_new, p_new = pk(eps_T, eps_p_T, p_row)
    Ct = expand_factored_tangent(el, sig_T, fac).T  # (n, 36)

    scale = float(jnp.max(jnp.abs(sig_ref)))
    np.testing.assert_allclose(np.asarray(sig_T.T), np.asarray(sig_ref), atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(Ct), np.asarray(Ct_ref), atol=5e-4 * E)
    np.testing.assert_allclose(np.asarray(p_new[0]), np.asarray(st_ref["p"]), atol=1e-6)
    assert np.asarray(p_new).max() > 1e-3
