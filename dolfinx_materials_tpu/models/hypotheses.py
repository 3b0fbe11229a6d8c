"""Modelling hypotheses: plane stress (and helpers for axisymmetry).

The reference exposes MFront's hypothesis map plane_strain / plane_stress / 3d /
axisymmetric (mfront.py:33-38). Plane strain and 3d are native here (the Mandel
6-vector carries ezz). Plane stress is a *wrapper behavior*: the out-of-plane
strain is solved per Gauss point so that sig_zz = 0, through the implicit-
function-theorem scalar solver — so ANY small-strain behavior (elastic, J2,
Norton, ...) gets a consistent plane-stress-condensed tangent for free.
Axisymmetry is a kinematic+measure concern handled in fem/forms.py
(axisymmetric_strain) and the QuadratureDomain coefficient.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.newton import scalar_newton_solve
from .base import SmallStrainBehavior


class PlaneStress(SmallStrainBehavior):
    """Enforce sig_zz = 0 by solving for eps_zz internally.

    The incoming Strain 6-vector's ezz slot MUST be 0 (2D kinematics produce 0
    there); the solved ezz is exposed as the ISV ``eps_zz``. A nonzero incoming
    ezz means a 3D-strain caller is misusing the wrapper — since this runs
    under vmap/jit where raising is impossible, such points have their stress
    poisoned with NaN, which the solver's non-finite |R| detection and the
    QuadratureMap NaN policy both surface immediately instead of silently
    returning a wrong answer.
    """

    def __init__(self, inner, tol=1e-10, max_iter=40):
        self.inner = inner
        self.tol = tol
        self.max_iter = max_iter

    def init_state(self):
        st = self.inner.init_state()
        assert "eps_zz" not in st
        return {**st, "eps_zz": jnp.zeros(())}

    def small_strain_update(self, eps, state, dt):
        inner_state = {k: v for k, v in state.items() if k != "eps_zz"}

        def res(ezz, eps, dt):
            e = eps.at[2].set(ezz)
            sig, _ = self.inner.small_strain_update(e, inner_state, dt)
            return sig[2]

        # elastic-like initial guess from the previous converged value
        ezz, _ = scalar_newton_solve(
            res,
            state["eps_zz"],
            args=(eps, dt),
            tol=self.tol,
            max_iter=self.max_iter,
        )
        e = eps.at[2].set(ezz)
        sig, new_inner = self.inner.small_strain_update(e, inner_state, dt)
        # Guard: a nonzero incoming ezz (3D-strain caller) poisons the output
        # rather than being silently discarded.
        bad = eps[2] != 0.0
        sig = jnp.where(bad, jnp.nan, 1.0) * sig
        return sig, {**new_inner, "eps_zz": ezz}
