"""Ogden factored-through-C tangent ("c6" mode, round 5) vs the f9 path.

The c6 mode computes dPK1/dF from 6 Hessian seeds of S(C) = 2 dW/dC plus
closed-form wrap algebra (models/hyperelasticity.py: _batched_update_c6)
instead of 9 linearize-replay seeds of the 9-dim PK1 map. Both AD routes
must agree to machine precision on both energy branches (near-spherical
series AND Cardano), and against an independent central finite difference.
Reference semantics: the MFront Ogden behavior
(reference mfront_materials/Ogden.mfront, demos/mfront/hyperelasticity).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dolfinx_materials_tpu.models import Ogden
from dolfinx_materials_tpu.ops import tensors as tn


def mixed_batch(n, seed=0, amp=0.1):
    """Identity points, spherical stretches (series branch) and wide-spread
    random F (Cardano branch) in one batch."""
    rng = np.random.default_rng(seed)
    F = np.tile(np.eye(3), (n, 1, 1)) + amp * rng.standard_normal((n, 3, 3))
    F[: n // 4] = np.eye(3)
    F[n // 4 : n // 3] = 1.3 * np.eye(3)
    F[n // 3 : n // 2] = np.diag([1.5, 0.8, 1.1])
    return jnp.asarray(np.asarray(tn.mat_to_nonsym(jnp.asarray(F))))


def test_c6_is_default_and_matches_f9():
    og = Ogden()
    assert og.tangent_mode == "c6"
    Fv = mixed_batch(96)
    pk1_c, Ct_c, _ = og.batched_update(Fv, {}, 0.0)
    og.tangent_mode = "f9"
    pk1_f, Ct_f, _ = og.batched_update(Fv, {}, 0.0)
    sc = float(jnp.max(jnp.abs(pk1_f)))
    np.testing.assert_allclose(pk1_c, pk1_f, atol=1e-12 * sc)
    np.testing.assert_allclose(
        Ct_c, Ct_f, atol=1e-12 * float(jnp.max(jnp.abs(Ct_f)))
    )


def test_c6_tangent_matches_finite_difference():
    """Independent of BOTH AD routes: central FD columns of PK1."""
    og = Ogden()
    Fv = mixed_batch(24, seed=1)
    _, Ct, _ = og.batched_update(Fv, {}, 0.0)
    Ct = Ct.reshape(-1, 9, 9)
    h = 1e-6
    for s in (0, 4, 8):
        e = np.zeros(9)
        e[s] = 1.0
        pk1p, _, _ = og.batched_update(Fv + h * jnp.asarray(e), {}, 0.0)
        pk1m, _, _ = og.batched_update(Fv - h * jnp.asarray(e), {}, 0.0)
        fd = (pk1p - pk1m) / (2 * h)
        np.testing.assert_allclose(
            Ct[:, :, s], fd, atol=1e-6 * float(jnp.max(jnp.abs(fd)))
        )


def test_c6_chunked_path_matches_single_chunk():
    """n > tangent_chunk exercises the lax.map chunking (incl. identity-F
    padding) of the c6 route."""
    og_small = Ogden(tangent_chunk=32)
    og_big = Ogden()
    Fv = mixed_batch(80, seed=2)  # 2 full chunks + 16-point remainder
    pk1_s, Ct_s, _ = og_small.batched_update(Fv, {}, 0.0)
    pk1_b, Ct_b, _ = og_big.batched_update(Fv, {}, 0.0)
    # chunked vs whole-batch differ only by f64 reduction order
    np.testing.assert_allclose(
        pk1_s, pk1_b, atol=1e-12 * float(jnp.max(jnp.abs(pk1_b)))
    )
    np.testing.assert_allclose(
        Ct_s, Ct_b, atol=1e-12 * float(jnp.max(jnp.abs(Ct_b)))
    )


def test_multiterm_ogden_and_neohooke_consistency():
    """Two-term Ogden: the c6 route must track f9 with multiple (mu, alpha)
    pairs too (different series/Cardano coefficients per term)."""
    og = Ogden(mu=(0.3e6, 0.1e6), alpha=(2.0, -2.0), K=1e9)
    Fv = mixed_batch(48, seed=3)
    pk1_c, Ct_c, _ = og.batched_update(Fv, {}, 0.0)
    og.tangent_mode = "f9"
    pk1_f, Ct_f, _ = og.batched_update(Fv, {}, 0.0)
    np.testing.assert_allclose(
        pk1_c, pk1_f, atol=1e-12 * float(jnp.max(jnp.abs(pk1_f)))
    )
    np.testing.assert_allclose(
        Ct_c, Ct_f, atol=1e-12 * float(jnp.max(jnp.abs(Ct_f)))
    )
