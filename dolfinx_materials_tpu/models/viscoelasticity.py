"""Linear viscoelasticity: generalized Maxwell (Prony series) with the exact
exponential integrator per branch.

Fills the viscoelastic slot of the reference's MFront behavior ecosystem (the
MFront DSL ships standard viscoelastic bricks; reference mfront.py:41-343
loads them) with a native jnp behavior family. The Zener standard linear
solid — the docs/custom_behaviors.md worked example — is the single-branch
case and is bundled here for direct use.

Model: volumetric response elastic (bulk ``kappa``); deviatoric response a
long-term spring ``mu_inf`` in parallel with N Maxwell branches
``(mu_i, tau_i)``. Each branch's viscous deviatoric strain follows
``d(epsv_i)/dt = (dev(eps) - epsv_i)/tau_i``, integrated with the exact
exponential update for strain held constant over the step (the discrete model
is therefore exactly the analytic relaxation for step-strain histories, and
``dt = 0`` is a fixed point — the elastic-predictor contract).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.tensors import I2, dev, tr
from .base import SmallStrainBehavior


class GeneralizedMaxwell(SmallStrainBehavior):
    """Prony-series viscoelasticity with ``len(branches)`` Maxwell branches.

    ``branches``: sequence of ``(mu_i, tau_i)`` pairs (shear modulus and
    relaxation time per branch). The instantaneous (glassy) shear modulus is
    ``mu_inf + sum(mu_i)``; the relaxed modulus is ``mu_inf``.
    """

    def __init__(self, kappa, mu_inf, branches):
        self.kappa = kappa
        self.mu_inf = mu_inf
        self.branches = tuple((float(m), float(t)) for (m, t) in branches)
        if not self.branches:
            raise ValueError("GeneralizedMaxwell needs at least one branch")

    def init_state(self):
        return {"epsv": jnp.zeros((len(self.branches), 6))}

    def relaxation_shear_modulus(self, t):
        """Closed-form mu(t) = mu_inf + sum mu_i exp(-t/tau_i) (for tests/
        calibration against relaxation data)."""
        mu = self.mu_inf
        for m, tau in self.branches:
            mu = mu + m * jnp.exp(-t / tau)
        return mu

    def small_strain_update(self, eps, state, dt):
        e = dev(eps)
        sig = self.kappa * tr(eps) * I2 + 2.0 * self.mu_inf * e
        new_rows = []
        for i, (m, tau) in enumerate(self.branches):
            a = jnp.exp(-dt / tau)  # dt=0 -> a=1 -> no flow
            epsv = e + (state["epsv"][i] - e) * a
            new_rows.append(epsv)
            sig = sig + 2.0 * m * (e - epsv)
        return sig, {"epsv": jnp.stack(new_rows)}


class ZenerViscoelasticity(GeneralizedMaxwell):
    """Standard linear solid: one Maxwell branch (mu1, tau) in parallel with
    (kappa, mu_inf). The docs/custom_behaviors.md worked example, bundled."""

    def __init__(self, kappa, mu_inf, mu1, tau):
        super().__init__(kappa, mu_inf, [(mu1, tau)])
