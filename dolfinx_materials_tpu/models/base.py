"""Behavior protocol: the TPU-native contract every material model implements.

Rebuild of the reference's duck-typed ``Material`` protocol (reference:
dolfinx_materials/generic.py:103-201) and of the jaxmat behavior surface it adapts
(reference: dolfinx_materials/jaxmat.py:158-193) with one key generalization: a
behavior maps a *dict* of differentiable inputs (gradients + external state
variables) to a *dict* of fluxes plus a new internal-state pytree. This uniformly
covers mechanics (Strain->Stress), finite strain (F->PK1) and generalized behaviors
(heat transfer: {TemperatureGradient, Temperature} -> {HeatFlux}, with an Enthalpy
internal variable appearing in tangent blocks — reference
demos/mfront/heat_transfer/*).

Consistent tangents are *not* part of the protocol: the
:class:`~dolfinx_materials_tpu.material.Material` adapter computes every declared
tangent block in a single forward-mode Jacobian pass, with implicit-function-theorem
roots inside the update keeping that pass O(n_inputs) linear solves.
"""

from __future__ import annotations


class Behavior:
    """Base class. Subclasses declare I/O signatures and the per-point update."""

    #: name -> number of (flattened) components of each gradient-like input
    gradients: dict = {}
    #: name -> number of components of each flux (thermodynamic force)
    fluxes: dict = {}
    #: name -> number of components of external state variables consumed
    external_state_variables: dict = {}

    #: extra tangent blocks (y_name, x_name) beyond the default flux x gradient
    #: pairing; y may be an internal state variable (e.g. ("Enthalpy", "Temperature")).
    extra_tangent_blocks: list = []

    def init_state(self) -> dict:
        """Per-point internal-state pytree template (dict of arrays, any shapes)."""
        return {}

    @property
    def tangent_blocks(self) -> list:
        """All (y, x) consistent-tangent blocks, default flux x gradient pairing.

        Reference semantics: dolfinx_materials/generic.py:142-146 plus MGIS
        ``tangent_operator_blocks`` introspection (mfront.py:243-262).
        """
        blocks = [(f, g) for f in self.fluxes for g in self.gradients]
        return blocks + list(self.extra_tangent_blocks)

    def constitutive_update(self, inputs: dict, state: dict, dt):
        """Per-point update: ``(inputs, state, dt) -> (fluxes: dict, new_state: dict)``.

        ``inputs`` holds every gradient and external state variable as flat jnp
        vectors of the declared sizes; ``state`` is this behavior's internal pytree.
        Must be pure and differentiable w.r.t. ``inputs`` (IFT roots allowed).
        """
        raise NotImplementedError

    @property
    def name(self) -> str:
        return type(self).__name__


class SmallStrainBehavior(Behavior):
    """Small-strain mechanics: Mandel strain (6,) -> Mandel Cauchy stress (6,).

    Subclasses implement ``small_strain_update(eps, state, dt)``.
    """

    gradients = {"Strain": 6}
    fluxes = {"Stress": 6}

    def constitutive_update(self, inputs, state, dt):
        sig, new_state = self.small_strain_update(inputs["Strain"], state, dt)
        return {"Stress": sig}, new_state

    def small_strain_update(self, eps, state, dt):
        raise NotImplementedError


class FiniteStrainBehavior(Behavior):
    """Finite-strain mechanics: deformation gradient F (9,) -> PK1 stress (9,).

    Vector convention [11,22,33,12,21,13,31,23,32]
    (reference: dolfinx_materials/utils.py:168-190); matches the reference's
    finite-strain setting of PK1 flux / dPK1_dF tangent (mfront.py:93-104,
    jaxmat.py:177-186). Subclasses implement ``finite_strain_update(F, state, dt)``.
    """

    gradients = {"F": 9}
    fluxes = {"PK1": 9}

    def constitutive_update(self, inputs, state, dt):
        pk1, new_state = self.finite_strain_update(inputs["F"], state, dt)
        return {"PK1": pk1}, new_state

    def finite_strain_update(self, F, state, dt):
        raise NotImplementedError
