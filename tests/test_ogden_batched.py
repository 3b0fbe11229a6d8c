"""Feature-major batched Ogden path vs the generic vmapped path: 1e-9 parity of
energy, PK1 and full tangent."""

import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material
from dolfinx_materials_tpu.models import Ogden
from dolfinx_materials_tpu.ops import tensors as tn
import pytest


@pytest.mark.slow
def test_ogden_batched_matches_generic():
    beh = Ogden(mu=(0.4e6,), alpha=(28.8,), K=1e9)
    mat = Material(beh)
    assert mat._fast_update is not None, "fast path must be wired"
    n = 16
    rng = np.random.default_rng(0)
    Fv = jnp.asarray(
        np.broadcast_to(np.asarray(tn.I9), (n, 9)) + 0.15 * rng.normal(size=(n, 9))
    )
    # degenerate + near-spherical points exercise the scalar-series branch
    Fv = Fv.at[0].set(jnp.asarray(tn.I9))
    Fv = Fv.at[1].set(1.2 * jnp.asarray(tn.I9))

    # energy parity
    import jax

    W_b = beh.strain_energy_batched(Fv)
    W_g = jax.vmap(lambda x: beh.strain_energy(tn.nonsym_to_mat(x)))(Fv)
    np.testing.assert_allclose(np.asarray(W_b), np.asarray(W_g), rtol=1e-10)

    # integrate() uses the fast path; compare against the generic adapter path
    sig_f, _, Ct_f = mat.integrate(Fv)
    sig_g, Ct_g, _ = mat.batched_constitutive_update(Fv, {}, mat.data_manager.s0.internal, 0.0)
    scale = float(jnp.max(jnp.abs(sig_g)))
    np.testing.assert_allclose(np.asarray(sig_f), np.asarray(sig_g), atol=1e-9 * scale)
    np.testing.assert_allclose(
        np.asarray(Ct_f),
        np.asarray(Ct_g).reshape(n, 81),
        atol=1e-7 * float(jnp.max(jnp.abs(Ct_g))),
    )
