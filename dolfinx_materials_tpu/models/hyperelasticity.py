"""Hyperelastic behaviors: strain energy in, PK1 + consistent tangent out via AD.

Rebuild of the reference's Ogden MFront behavior
(mfront_materials/Ogden.mfront — hand-derived dS/dC over ~60 lines of C++) and the
hyperelasticity demo corpus (demos/mfront/hyperelasticity). TPU-first: the model is
just a scalar energy ``W(F)``; ``PK1 = dW/dF`` by reverse-mode AD and the tangent
``dPK1/dF`` by forward-over-reverse — no hand-derived fourth-order tensors. Stretch
powers use the eigh-free ``ops.matfun`` kernels (pure matmuls, AD-safe at F = I).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import matfun, tensors
from .base import FiniteStrainBehavior


class HyperelasticBehavior(FiniteStrainBehavior):
    """Base: subclasses implement ``strain_energy(F)`` on 3x3 deformation gradients."""

    def strain_energy(self, F):
        raise NotImplementedError

    def finite_strain_update(self, F, state, dt):
        def W(Fvec):
            return self.strain_energy(tensors.nonsym_to_mat(Fvec))

        pk1 = jax.grad(W)(F)
        return pk1, state


class SaintVenantKirchhoff(HyperelasticBehavior):
    """W = lambda/2 tr(E)^2 + mu tr(E^2), E = (C - I)/2.

    The inclusion material of the reference's hyperelasticity demo
    (demos/mfront/hyperelasticity — UFL SVK part).
    """

    def __init__(self, E, nu):
        self.E = E
        self.nu = nu

    def strain_energy(self, F):
        lmbda = self.E * self.nu / (1 + self.nu) / (1 - 2 * self.nu)
        mu = self.E / 2.0 / (1 + self.nu)
        C = F.T @ F
        Egl = 0.5 * (C - jnp.eye(3, dtype=F.dtype))
        return 0.5 * lmbda * jnp.trace(Egl) ** 2 + mu * jnp.trace(Egl @ Egl)


class NeoHooke(HyperelasticBehavior):
    """Compressible neo-Hookean: W = mu/2 (I1_bar - 3) + K/2 (J - 1)^2."""

    def __init__(self, mu, K):
        self.mu = mu
        self.K = K

    def strain_energy(self, F):
        C = F.T @ F
        J = tensors.det33(F)
        I1b = jnp.trace(C) * J ** (-2.0 / 3.0)
        return 0.5 * self.mu * (I1b - 3.0) + 0.5 * self.K * (J - 1.0) ** 2


class Ogden(HyperelasticBehavior):
    """Multi-term compressible Ogden model on isochoric principal stretches:

    W = sum_p 2 mu_p / alpha_p^2 (lbar_1^alpha_p + lbar_2^alpha_p + lbar_3^alpha_p - 3)
        + K/2 (J - 1)^2

    with lbar_i = J^(-1/3) lambda_i, i.e. sum lbar^alpha = tr(Cbar^(alpha/2)).

    Parameter mapping to the reference behavior (mfront_materials/Ogden.mfront:
    alpha=28.8, mu=2*0.4e6/28.8, K): its ``mu`` equals ``2 mu_p / alpha_p`` here, so
    the demo material is ``Ogden(mu=(0.4e6,), alpha=(28.8,), K=69444444 * ...)`` —
    the physical shear modulus is sum_p mu_p (verified in tests by the small-strain
    limit of the AD tangent).

    Stretch powers are computed as tr(Cbar^(a/2)) via ``matfun.powm`` — matmul-only,
    so the MXU does the work and the tangent is finite at F = I (where the MFront
    implementation needs a guarded isotropic-function derivative, Ogden.mfront:66-70).
    """

    def __init__(self, mu=(0.4e6,), alpha=(28.8,), K=69444444.0 * 28.8 / 2):
        self.mu = tuple(mu)
        self.alpha = tuple(alpha)
        self.K = K

    def strain_energy(self, F):
        C = F.T @ F
        J2 = tensors.det33(C)
        J = jnp.sqrt(J2)
        W = 0.5 * self.K * (J - 1.0) ** 2
        logC = matfun.logm(C)
        for mu_p, a_p in zip(self.mu, self.alpha):
            # tr(Cbar^(a/2)) = J^(-a/3) tr(C^(a/2))
            trCa = jnp.trace(matfun.expm(0.5 * a_p * logC))
            W = W + 2.0 * mu_p / a_p**2 * (J ** (-a_p / 3.0) * trCa - 3.0)
        return W

    # ------------------------------------------------- TPU whole-batch path
    def strain_energy_batched(self, Fv):
        """Energy of a whole batch, feature-major (3,3,n) internals.

        The vmapped per-point path materializes (n,3,3) intermediates whose
        minor (3,3) dims pad ~42x on TPU tiles; this path keeps the point axis
        on the 128-wide lanes. Stretch powers come from the closed-form Cardano
        eigenvalues of C (ops/matfun_fm.eigvals_sym) — the energy is an
        isotropic invariant function, so eigenVECTORS are never needed and the
        whole update is ~100 elementwise ops. ``Fv (n,9) -> W (n,)``."""
        from ..ops import matfun_fm as fm

        F = fm.from_nonsym_rows(Fv)
        C = fm.bmm(fm.transpose(F), F)
        J = jnp.sqrt(fm.det(C))
        W = 0.5 * self.K * (J - 1.0) ** 2
        lams = fm.eigvals_sym(C)  # squared stretches, guarded positive
        for mu_p, a_p in zip(self.mu, self.alpha):
            tr_a = sum(jnp.maximum(l, 1e-12) ** (0.5 * a_p) for l in lams)
            W = W + 2.0 * mu_p / a_p**2 * (J ** (-a_p / 3.0) * tr_a - 3.0)
        return W

    def batched_update(self, Fv, state, dt):
        """Whole-batch PK1 + consistent tangent (picked up by Material.integrate):
        PK1 from one reverse-mode pass over the batch energy (per-point energies
        are independent, so grad-of-sum IS the per-point gradient), tangent from
        9 batched forward-mode columns."""

        def pk1_fn(x):
            return jax.grad(lambda y: jnp.sum(self.strain_energy_batched(y)))(x)

        pk1 = pk1_fn(Fv)
        n = Fv.shape[0]
        cols = []
        for k in range(9):
            seed = jnp.zeros_like(Fv).at[:, k].set(1.0)
            cols.append(jax.jvp(pk1_fn, (Fv,), (seed,))[1])
        Ct = jnp.stack(cols, axis=-1)  # (n, 9, 9) = d pk1_i / d F_k
        return pk1, Ct.reshape(n, 81), state
