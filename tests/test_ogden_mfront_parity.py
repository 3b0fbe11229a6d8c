"""Ogden parameter-convention parity against the reference MFront behavior.

The reference's hyperelasticity benchmark uses Ogden.mfront with
``alpha=28.8, mu=27778, K=69444444`` (reference demos/mfront/
hyperelasticity/Ogden.mfront:8-12 — identical to mfront_materials/
Ogden.mfront). Its integrator computes the PK2 stress analytically; this
test reimplements that exact formula (eigen-decomposition form,
Ogden.mfront:23-56) as an independent f64 golden and pins our AD-energy
model against it:

- our ``mu`` convention: mu_ours = mu_mfront * alpha / 2 (the isochoric
  energies W = 2 mu_ours/alpha^2 (...) and W = mu_mfront/alpha (...) match);
- our ``K`` convention: K_ours = K_mfront VERBATIM — both volumetric
  energies are K (J-1)^2 / 2. Round 1-3 benches used K=1e9 =
  K_mfront*alpha/2, i.e. a 14.4x stiffer bulk than the reference problem
  (an over-hard proxy); this test prevents that regression.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dolfinx_materials_tpu.models import Ogden
from dolfinx_materials_tpu.ops import tensors

ALPHA, MU_MF, K_MF = 28.8, 27778.0, 69444444.0


def S_mfront(F):
    """PK2 stress of the reference Ogden.mfront integrator (:23-56), f64."""
    a = ALPHA / 2
    C = F.T @ F
    J = np.linalg.det(F)
    I3 = J * J
    C2 = C @ C
    I1 = np.trace(C)
    I2 = (I1 * I1 - np.trace(C2)) / 2
    dI3_dC = C2 - I1 * C + I2 * np.eye(3)
    Sv = K_MF * (J - 1) / J * dI3_dC
    iJb = I3 ** (-1 / 3.0)
    c = iJb ** (a - 2)
    diJb_dC = (-(iJb**4) / 3) * dI3_dC
    vp, m = np.linalg.eigh(C)
    pwv = vp ** (a - 2)
    dfv = a * vp * pwv
    fv = np.sum(vp * vp * pwv)
    df_dC = m @ np.diag(dfv) @ m.T
    Si = MU_MF * c * iJb * (fv * diJb_dC + (iJb / a) * df_dC)
    return Sv + Si


@pytest.fixture(scope="module")
def model():
    # exact convention map: mu = mu_mfront*alpha/2, K = K_mfront
    return Ogden(mu=(MU_MF * ALPHA / 2.0,), alpha=(ALPHA,), K=K_MF)


def test_pk2_parity_batched_path(model):
    """S = F^-1 dW/dF matches the mfront analytic PK2 to 1e-9 (f64) on
    random 20%-strain states — the whole-batch path the fused step uses."""
    rng = np.random.default_rng(0)
    Fs = np.eye(3)[None] + 0.2 * rng.standard_normal((20, 3, 3))
    Fv = tensors.mat_to_nonsym(jnp.asarray(Fs))
    pk1 = jax.grad(lambda x: jnp.sum(model.strain_energy_batched(x)))(Fv)
    P = np.asarray(tensors.nonsym_to_mat(pk1))
    for k in range(len(Fs)):
        S_ours = np.linalg.solve(Fs[k], P[k])
        S_ref = S_mfront(Fs[k])
        err = np.abs(S_ours - S_ref).max() / np.abs(S_ref).max()
        assert err < 1e-9, f"point {k}: rel err {err:.2e}"


def test_pk2_parity_per_point_path(model):
    """The per-point energy (matfun logm/expm route) agrees too (looser:
    the log/exp series tolerance)."""
    rng = np.random.default_rng(1)
    F = np.eye(3) + 0.15 * rng.standard_normal((3, 3))
    P = jax.grad(model.strain_energy)(jnp.asarray(F))
    S_ours = np.linalg.solve(F, np.asarray(P))
    S_ref = S_mfront(F)
    err = np.abs(S_ours - S_ref).max() / np.abs(S_ref).max()
    assert err < 1e-5


def test_wrong_K_convention_is_detected(model):
    """K=K_mfront*alpha/2 (the round-1..3 slip) is measurably NOT the
    reference behavior: volumetric response off by alpha/2 = 14.4x."""
    bad = Ogden(mu=(MU_MF * ALPHA / 2.0,), alpha=(ALPHA,), K=K_MF * ALPHA / 2)
    F = np.diag([1.05, 1.05, 1.05])  # pure dilatation
    Fv = tensors.mat_to_nonsym(jnp.asarray(F)).reshape(1, 9)
    for m, expect_ok in ((model, True), (bad, False)):
        pk1 = jax.grad(lambda x: jnp.sum(m.strain_energy_batched(x)))(Fv)
        P = np.asarray(tensors.nonsym_to_mat(pk1.reshape(9)))
        S = np.linalg.solve(F, P)
        err = np.abs(S - S_mfront(F)).max() / np.abs(S_mfront(F)).max()
        assert (err < 1e-9) == expect_ok
