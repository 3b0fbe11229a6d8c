"""Finite-strain plasticity: multiplicative FeFp and the Hencky log-strain wrapper.

Rebuild of:
- jaxmat's ``FeFpJ2Plasticity(elasticity=..., yield_stress=...)`` — gradient F (9),
  flux PK1 (9), ISVs ``be`` (elastic left Cauchy-Green, init identity) and ``p``
  (reference call sites: tests/test_FeFp_jax.py:19-31,
  demos/jax/finite_strain_elastoplasticity.py:169-184);
- MFront's Hencky logarithmic-strain framework (``@StrainMeasure Hencky``) that
  wraps any small-strain behavior into a finite-strain one
  (demos/mfront/finite_strain_elastoplasticity/LogarithmicStrainPlasticity.mfront).

TPU-first: the exponential-map return uses the eigh-free ``ops.matfun`` log/exp
(matmul-only, AD-safe at F = I) and reuses the scalar IFT radial return of the
small-strain J2 model, so the consistent tangent dPK1/dF costs 9 forward-mode
directions through one scalar implicit solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import matfun, tensors
from ..ops.newton import scalar_newton_solve
from .base import FiniteStrainBehavior


class FeFpJ2Plasticity(FiniteStrainBehavior):
    """Multiplicative J2 elastoplasticity, Simo exponential return mapping.

    Hencky (logarithmic) hyperelastic response in the elastic logarithmic strain
    eps_e = 1/2 log(be): Kirchhoff stress tau = lambda tr(eps_e) I + 2 mu eps_e.
    Yield: von Mises on tau with isotropic hardening sigma_Y(p).

    Internal state: ``be`` (Mandel 6, init identity), ``p`` (scalar), plus
    ``F_prev`` (9-vector, init identity) carrying the previous converged
    deformation gradient needed by the relative-deformation predictor
    be_trial = f be_old f^T, f = F F_prev^{-1}.
    """

    def __init__(self, elasticity, yield_stress, tol=1e-10, max_iter=50):
        self.elasticity = elasticity
        self.yield_stress = yield_stress
        self.tol = tol
        self.max_iter = max_iter

    def init_state(self):
        return {
            "be": jnp.asarray(tensors.I2),
            "p": jnp.zeros(()),
            "F_prev": jnp.asarray(tensors.I9),
        }

    def finite_strain_update(self, Fvec, state, dt):
        el = self.elasticity
        mu = el.mu
        F = tensors.nonsym_to_mat(Fvec)
        F_prev = tensors.nonsym_to_mat(state["F_prev"])
        be_old = tensors.sym_to_mat(state["be"])
        p = state["p"]

        # trial elastic left Cauchy-Green via the relative deformation gradient
        f_rel = F @ tensors.inv33(F_prev)
        be_tr = f_rel @ be_old @ f_rel.T
        eps_e_tr = tensors.mat_to_sym(0.5 * matfun.logm(be_tr))

        tau_tr = el.stress(eps_e_tr)
        s_tr = tensors.dev(tau_tr)
        sigY0 = self.yield_stress(p)
        q_tr = tensors.eq_vm_safe(tau_tr, 1.0 + sigY0)

        def residual(dp, f_act, p0):
            return f_act - 3.0 * mu * dp - (
                self.yield_stress(p0 + dp) - self.yield_stress(p0)
            )

        f_act = jnp.maximum(q_tr - sigY0, 0.0)
        dp, _ = scalar_newton_solve(
            residual,
            jnp.zeros_like(q_tr),
            args=(f_act, p),
            tol=self.tol * (1.0 + sigY0),
            max_iter=self.max_iter,
            lower=0.0,
        )

        n = 1.5 * s_tr / q_tr
        eps_e = eps_e_tr - dp * n
        tau = tau_tr - 2.0 * mu * dp * n

        be_new = matfun.expm(2.0 * tensors.sym_to_mat(eps_e))
        # PK1 = tau F^{-T}
        P = tensors.sym_to_mat(tau) @ tensors.inv33(F).T
        new_state = {
            "be": tensors.mat_to_sym(be_new),
            "p": p + dp,
            "F_prev": Fvec,
        }
        return tensors.mat_to_nonsym(P), new_state


class HenckyFiniteStrain(FiniteStrainBehavior):
    """Lagrangian logarithmic-strain wrapper around ANY small-strain behavior.

    The MFront ``@StrainMeasure Hencky`` framework
    (demos/mfront/finite_strain_elastoplasticity): the total Hencky strain
    E_log = 1/2 log(C) feeds the wrapped small-strain update, whose output T is the
    work conjugate of E_log; the PK1 stress follows from conjugacy,
    P = (dE_log/dF)^T : T — computed here as one reverse-mode VJP through the
    eigh-free matrix log (the reference delegates this conversion to TFEL C++).
    """

    def __init__(self, small_strain_behavior):
        self.inner = small_strain_behavior

    def init_state(self):
        return self.inner.init_state()

    def finite_strain_update(self, Fvec, state, dt):
        def E_log(Fv):
            F = tensors.nonsym_to_mat(Fv)
            C = F.T @ F
            return tensors.mat_to_sym(0.5 * matfun.logm(C))

        eps, pullback = jax.vjp(E_log, Fvec)
        T, new_state = self.inner.small_strain_update(eps, state, dt)
        (pk1,) = pullback(T)
        return pk1, new_state
