"""Generalized (non-mechanical) behaviors: nonlinear heat transfer + phase change.

Rebuild of the reference's generic-behaviour heat corpus
(demos/mfront/heat_transfer/StationaryHeatTransfer.mfront and
HeatTransferPhaseChange.mfront, driven by nonlinear_heat_transfer.py and
phase_change.py). These exercise the framework's multi-input tangent machinery:
the flux depends on BOTH the temperature gradient and the temperature itself
(blocks dj/d∇T and dj/dT), and the phase-change enthalpy ISV enters the transient
residual with its own dh/dT block. Here all blocks come from ONE forward-mode
pass in the Material adapter — the reference hand-codes them in C++
(StationaryHeatTransfer.mfront:29-32, HeatTransferPhaseChange.mfront:61-65).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Behavior


class NonlinearHeatTransfer(Behavior):
    """Fourier conduction with temperature-dependent conductivity
    k(T) = 1 / (A + B T); j = -k(T) grad(T)
    (reference: StationaryHeatTransfer.mfront:15-27)."""

    def __init__(self, A=0.0375, B=2.165e-4, dim=2):
        self.A = A
        self.B = B
        self.dim = dim
        self.gradients = {"TemperatureGradient": dim}
        self.fluxes = {"HeatFlux": dim}
        self.external_state_variables = {"Temperature": 1}
        self.extra_tangent_blocks = [("HeatFlux", "Temperature")]

    def conductivity(self, T):
        return 1.0 / (self.A + self.B * T)

    def constitutive_update(self, inputs, state, dt):
        T = inputs["Temperature"][0]
        g = inputs["TemperatureGradient"]
        return {"HeatFlux": -self.conductivity(T) * g}, state


class ThermoElasticIsotropic(Behavior):
    """Thermo-elasticity: sig = C : (eps - alpha (T - T0) I).

    Exercises the flux x external-state-variable tangent block
    (d Stress / d Temperature) in a mechanical behavior — the coupling pattern
    of the reference's generalized-behaviour machinery applied to mechanics.
    Use in a staggered thermo-mechanical loop (demos/thermomechanics.py).
    """

    def __init__(self, E, nu, alpha_th, T0=293.15):
        from .elasticity import LinearElasticIsotropic

        self.elastic = LinearElasticIsotropic(E, nu)
        self.alpha_th = alpha_th
        self.T0 = T0
        self.gradients = {"Strain": 6}
        self.fluxes = {"Stress": 6}
        self.external_state_variables = {"Temperature": 1}
        self.extra_tangent_blocks = [("Stress", "Temperature")]

    def constitutive_update(self, inputs, state, dt):
        import jax.numpy as jnp

        from ..ops import tensors

        eps = inputs["Strain"]
        T = inputs["Temperature"][0]
        eps_th = self.alpha_th * (T - self.T0) * jnp.asarray(
            tensors.I2, eps.dtype
        )
        return {"Stress": self.elastic.stress(eps - eps_th)}, state


class PhaseChangeHeatTransfer(Behavior):
    """Conduction with solid/liquid phase change via a smoothed enthalpy ISV.

    Piecewise state (reference HeatTransferPhaseChange.mfront:37-59):
    - solid  (T < Ts): k = ks, h = cs T
    - liquid (T > Tl): k = kl, h = cl (T - Tl) + dh_sl + cs Ts + (cs+cl) Tsm/2
    - mushy: k linear in T, c_eff = (cs+cl)/2 + dh_sl/Tsm, h = cs Ts + c_eff (T-Ts)
    Tangent blocks dj/d∇T, dj/dT and dh/dT come from AD of these formulas.
    """

    def __init__(
        self,
        Tm=933.15,
        ks=210.0,
        cs=3.0e6,
        kl=95.0,
        cl=2.58e6,
        dh_sl=1.08048e9,
        Tsmooth=0.1,
        dim=2,
    ):
        self.Tm, self.ks, self.cs, self.kl, self.cl = Tm, ks, cs, kl, cl
        self.dh_sl, self.Tsmooth = dh_sl, Tsmooth
        self.dim = dim
        self.gradients = {"TemperatureGradient": dim}
        self.fluxes = {"HeatFlux": dim}
        self.external_state_variables = {"Temperature": 1}
        self.extra_tangent_blocks = [
            ("HeatFlux", "Temperature"),
            ("Enthalpy", "Temperature"),
        ]

    def init_state(self):
        return {"Enthalpy": jnp.zeros(1)}

    def _k_h(self, T):
        Ts = self.Tm - self.Tsmooth / 2
        Tl = self.Tm + self.Tsmooth / 2
        c_m = (self.cs + self.cl) / 2 + self.dh_sl / self.Tsmooth
        k_solid, h_solid = self.ks, self.cs * T
        k_liquid = self.kl
        h_liquid = (
            self.cl * (T - Tl)
            + self.dh_sl
            + self.cs * Ts
            + (self.cs + self.cl) * self.Tsmooth / 2
        )
        k_mushy = self.ks + (self.kl - self.ks) * (T - Ts) / self.Tsmooth
        h_mushy = self.cs * Ts + c_m * (T - Ts)
        k = jnp.where(T < Ts, k_solid, jnp.where(T > Tl, k_liquid, k_mushy))
        h = jnp.where(T < Ts, h_solid, jnp.where(T > Tl, h_liquid, h_mushy))
        return k, h

    def constitutive_update(self, inputs, state, dt):
        T = inputs["Temperature"][0]
        g = inputs["TemperatureGradient"]
        k, h = self._k_h(T)
        return {"HeatFlux": -k * g}, {"Enthalpy": jnp.reshape(h, (1,))}


class ThermoMechanicalHeat(Behavior):
    """Conduction + a mechanically-coupled heat source: the two-way partner of
    :class:`ThermoElasticIsotropic` for MONOLITHIC thermo-mechanics.

        j = -k grad(T),   Source = kappa (T - T0) + chi eps_v

    where ``eps_v`` (volumetric strain, an external state variable fed from the
    mechanical field) injects heat where the structure dilates — the
    Gough-Joule-type coupling. With large ``chi * alpha_th`` the block
    Gauss-Seidel iteration (solve_coupled) limit-cycles while the monolithic
    blocked Newton converges at full rate (tests/test_blocked.py).
    """

    def __init__(self, k=1.0, kappa=0.0, chi=0.0, T0=293.15, dim=2):
        self.k, self.kappa, self.chi, self.T0, self.dim = k, kappa, chi, T0, dim
        self.gradients = {"TemperatureGradient": dim}
        self.fluxes = {"HeatFlux": dim, "Source": 1}
        self.external_state_variables = {"Temperature": 1, "VolStrain": 1}
        self.extra_tangent_blocks = [
            ("Source", "Temperature"),
            ("Source", "VolStrain"),
        ]

    def constitutive_update(self, inputs, state, dt):
        T = inputs["Temperature"][0]
        ev = inputs["VolStrain"][0]
        g = inputs["TemperatureGradient"]
        src = self.kappa * (T - self.T0) + self.chi * ev
        return {"HeatFlux": -self.k * g, "Source": jnp.reshape(src, (1,))}, state
