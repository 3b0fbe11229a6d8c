"""Material adapter: batches a Behavior over Gauss points with consistent tangents.

Rebuild of the reference's ``JAXMaterial`` adapter (reference:
dolfinx_materials/jaxmat.py:141-234) and the generic ``Material`` protocol
(generic.py:103-201):

- ``batched_update = jit(vmap(jacfwd(update, has_aux=True)))`` over the Gauss-point
  axis — the exact structure of jaxmat.py:147-155, but with implicit-function-theorem
  roots inside the update (ops/newton.py) so the Jacobian pass never unrolls local
  Newton loops;
- every declared tangent block (flux x gradient, plus ISV x ESV blocks for
  generalized behaviors) is sliced out of ONE forward-mode Jacobian and packed into
  the flat layout the QuadratureMap scatters (reference packing:
  quadrature_map.py:83-105, 331-348);
- state lives in the jnp DataManager (state.py) — no pytree<->flat conversions on
  the hot path (the reference converts both ways per call, jaxmat.py:208-234).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .state import DataManager, _slices
from .utils.timers import timer


class Material:
    """Wraps a :class:`~dolfinx_materials_tpu.models.base.Behavior` into the
    batched, stateful protocol the QuadratureMap and solvers consume."""

    def __init__(self, behavior, dtype=None, name=None):
        self.behavior = behavior
        self._name = name or behavior.name
        self.dtype = dtype
        self.data_manager: DataManager | None = None
        self.rotation_matrix = None  # optional (3,3) or (n,3,3) global->material

        # --- signature bookkeeping -----------------------------------------
        self.gradients = dict(behavior.gradients)
        self.fluxes = dict(behavior.fluxes)
        self.external_state_variables = dict(behavior.external_state_variables)
        init_state = behavior.init_state()
        self.internal_state_variables = {
            k: int(np.prod(jnp.shape(v))) if jnp.ndim(v) else 1
            for k, v in init_state.items()
        }
        self.tangent_blocks = {
            (y, x): (self._field_size(y), self._input_size(x))
            for (y, x) in behavior.tangent_blocks
        }

        # differentiable inputs = gradients then ESVs, concatenated flat
        self._input_sizes = {**self.gradients, **self.external_state_variables}
        self._in_slices = _slices(self._input_sizes)
        self.n_inputs = sum(self._input_sizes.values())
        # outputs that need tangents = fluxes then any ISV named as a block "y"
        tangent_isvs = [
            y for (y, _) in self.tangent_blocks if y in self.internal_state_variables
        ]
        self._out_sizes = dict(self.fluxes)
        for y in tangent_isvs:
            self._out_sizes.setdefault(y, self.internal_state_variables[y])
        self._out_slices = _slices(self._out_sizes)
        self._tangent_isvs = list(dict.fromkeys(tangent_isvs))

        # external state variable values, set by the QuadratureMap before integrate
        self.external_state: dict = {}
        # spatially-varying material properties (behavior.material_properties)
        self.material_property_values: dict = {}

        self._build_batched()

    # ------------------------------------------------------------------ API
    @property
    def name(self):
        return self._name

    @property
    def gradient_names(self):
        return list(self.gradients.keys())

    @property
    def flux_names(self):
        return list(self.fluxes.keys())

    @property
    def internal_state_variable_names(self):
        return list(self.internal_state_variables.keys())

    def _field_size(self, name):
        if name in self.fluxes:
            return self.fluxes[name]
        if name in self.internal_state_variables:
            return self.internal_state_variables[name]
        raise KeyError(f"tangent block output '{name}' is not a flux or ISV")

    def _input_size(self, name):
        if name in self.gradients:
            return self.gradients[name]
        if name in self.external_state_variables:
            return self.external_state_variables[name]
        raise KeyError(f"tangent block input '{name}' is not a gradient or ESV")

    # --------------------------------------------------------- compiled core
    def _build_batched(self):
        behavior = self.behavior
        in_slices = self._in_slices
        out_slices = self._out_slices
        flux_names = self.flux_names
        tangent_isvs = self._tangent_isvs
        blocks = list(self.tangent_blocks.keys())

        def point_update(x_flat, props, state, dt):
            def f(x):
                inputs = {k: x[sl] for k, sl in in_slices.items()}
                inputs.update(props)
                flux_dict, new_state = behavior.constitutive_update(inputs, state, dt)
                outs = [jnp.ravel(flux_dict[n]) for n in flux_names]
                outs += [jnp.ravel(new_state[n]) for n in tangent_isvs]
                y = jnp.concatenate(outs) if outs else jnp.zeros(0, x.dtype)
                return y, (flux_dict, new_state)

            J, (flux_dict, new_state) = jax.jacfwd(f, has_aux=True)(x_flat)
            flux_flat = jnp.concatenate(
                [jnp.ravel(flux_dict[n]) for n in flux_names]
            )
            Ct_parts = [
                jnp.ravel(J[out_slices[y], in_slices[x]]) for (y, x) in blocks
            ]
            Ct_flat = (
                jnp.concatenate(Ct_parts)
                if Ct_parts
                else jnp.zeros(0, x_flat.dtype)
            )
            return flux_flat, Ct_flat, new_state

        self._point_update = point_update

        def point_flux(x_flat, props, state, dt):
            """Tangent-free update: one behavior evaluation, no jacfwd pass.
            Used by line-search residual trials (VERDICT r1 item 8) — a
            backtrack costs 1 constitutive evaluation instead of 1 + n_inputs
            forward-mode passes."""
            inputs = {k: x_flat[sl] for k, sl in in_slices.items()}
            inputs.update(props)
            flux_dict, new_state = behavior.constitutive_update(inputs, state, dt)
            flux_flat = jnp.concatenate(
                [jnp.ravel(flux_dict[n]) for n in flux_names]
            )
            return flux_flat, new_state

        self._point_flux = point_flux
        self.batched_constitutive_update = jax.jit(
            jax.vmap(point_update, in_axes=(0, 0, 0, None))
        )
        self.batched_flux_update = jax.jit(
            jax.vmap(point_flux, in_axes=(0, 0, 0, None))
        )

        # optional whole-batch fast path supplied by the behavior (e.g. the
        # analytic-tangent J2 kernel, ops/j2_fast.py). Only usable for the
        # single-gradient/no-ESV/no-props signature.
        fast = getattr(behavior, "batched_update", None)
        self._fast_update = None
        self._fast_flux = None
        if (
            fast is not None
            and not self.external_state_variables
            and not getattr(behavior, "material_properties", {})
            and len(self.tangent_blocks) == 1
        ):
            self._fast_update = jax.jit(fast)
            # optional tangent-free whole-batch companion (e.g. FeFp, whose
            # 9-column tangent is ~10x the flux cost — unlike j2_fast where
            # the analytic tangent is near-free)
            fast_flux = getattr(behavior, "batched_flux", None)
            if fast_flux is not None:
                self._fast_flux = jax.jit(fast_flux)

    # ------------------------------------------------------------- lifecycle
    def set_data_manager(self, ngauss: int):
        self.data_manager = DataManager(self.behavior, ngauss, self.dtype)

    def update_external_state_variable(self, name, values):
        if name not in self.external_state_variables:
            raise KeyError(f"behavior does not declare ESV '{name}'")
        self.external_state[name] = jnp.asarray(values)

    def update_material_property(self, name, values):
        """Update a material property; scalar/array values of a declared
        spatially-varying property, or a plain behavior attribute (recompiles)."""
        if name in getattr(self.behavior, "material_properties", {}):
            self.material_property_values[name] = jnp.asarray(values)
        else:
            setattr(self.behavior, name, values)
            # drop any behavior-level cached whole-batch kernel that closed over
            # the old parameters (e.g. vonMisesIsotropicHardening._fast), then
            # rebuild the jitted paths
            for cached in ("_fast", "_fast_key", "_batched", "_kernel"):
                self.behavior.__dict__.pop(cached, None)
            self._build_batched()

    # ------------------------------------------------------------- rotations
    def _rotation_ops(self, n, dtype):
        """Per-size rotation operators from ``self.rotation_matrix``.

        Replaces MGIS ``rotateGradients``/``rotateThermodynamicForces``/
        ``rotateTangentOperatorBlocks`` (reference mfront.py:336-343) with batched
        Mandel/9-vector rotation matmuls. ``rotation_matrix`` maps GLOBAL ->
        MATERIAL frame (the reference test convention,
        tests/uniaxial_tension.py:59-68); shape (3,3) or (n,3,3).
        """
        from .ops import tensors as _tn

        R = jnp.asarray(self.rotation_matrix, dtype)
        if R.ndim == 2:
            R = jnp.broadcast_to(R, (n, 3, 3))
        ops = {}
        sizes = set(self._input_sizes.values()) | set(self._out_sizes.values())
        for s in sizes:
            if s == 6:
                ops[6] = _tn.rotation_to_mandel6(R)
            elif s == 9:
                ops[9] = _tn.rotation_to_9(R)
            elif s == 3:
                ops[3] = R
        return ops

    def _rotate_cols(self, arr, slices, sizes, ops, transpose):
        out = arr
        for name, sl in slices.items():
            s = sizes[name]
            Q = ops.get(s)
            if Q is None:
                continue
            block = arr[:, sl]
            Qe = jnp.swapaxes(Q, 1, 2) if transpose else Q
            out = out.at[:, sl].set(jnp.einsum("nij,nj->ni", Qe, block))
        return out

    # ------------------------------------------------------------- integrate
    def integrate(self, gradients, dt=0.0):
        """Batched constitutive update on ``gradients (n, sum(grad sizes))``.

        Returns ``(flux (n, nflux), isv_flat (n, nisv), Ct_flat (n, sum block
        sizes))`` and stores the trial state in ``data_manager.s1`` — the
        reference's integrate contract (generic.py:176-189, jaxmat.py:208-234).
        """
        dm = self.data_manager
        if dm is None:
            self.set_data_manager(jnp.shape(gradients)[0])
            dm = self.data_manager
        n = dm.n
        gradients = jnp.asarray(gradients)
        x = self._assemble_inputs(gradients, n)
        props = self._assemble_props(n)

        rot = None
        if self.rotation_matrix is not None:
            rot = self._rotation_ops(n, x.dtype)
            x = self._rotate_cols(x, self._in_slices, self._input_sizes, rot, False)

        with timer(f"{self.name}: constitutive update"):
            if self._fast_update is not None:
                flux, Ct, new_state = self._fast_update(x, dm.s0.internal, dt)
                Ct = Ct.reshape(n, -1)
            else:
                flux, Ct, new_state = self.batched_constitutive_update(
                    x, props, dm.s0.internal, dt
                )

        if rot is not None:
            flux = self._rotate_cols(
                flux, _slices(self.fluxes), self.fluxes, rot, True
            )
            Ct = self._rotate_tangent(Ct, rot)

        s1 = dm.s1
        s1.gradients = gradients
        s1.fluxes = flux
        s1.internal = dict(new_state)
        isv_flat = s1.internal_state_variables
        return flux, isv_flat, Ct

    def integrate_flux_only(self, gradients, dt=0.0):
        """Tangent-free batched update: ``(flux (n, nflux), isv_flat)``.

        Same contract as :meth:`integrate` (rotations included, trial state
        stored in s1) but skips the jacfwd tangent pass entirely — the cheap
        evaluation line-search backtracking needs (reference cost note:
        solvers.py residual callback always paid full tangents)."""
        dm = self.data_manager
        if dm is None:
            self.set_data_manager(jnp.shape(gradients)[0])
            dm = self.data_manager
        n = dm.n
        gradients = jnp.asarray(gradients)
        x = self._assemble_inputs(gradients, n)
        props = self._assemble_props(n)

        rot = None
        if self.rotation_matrix is not None:
            rot = self._rotation_ops(n, x.dtype)
            x = self._rotate_cols(x, self._in_slices, self._input_sizes, rot, False)

        with timer(f"{self.name}: constitutive update (flux-only)"):
            if self._fast_flux is not None:
                flux, new_state = self._fast_flux(x, dm.s0.internal, dt)
            elif self._fast_update is not None:
                # the analytic fast path's tangent is near-free; reuse it
                flux, _, new_state = self._fast_update(x, dm.s0.internal, dt)
            else:
                flux, new_state = self.batched_flux_update(
                    x, props, dm.s0.internal, dt
                )

        if rot is not None:
            flux = self._rotate_cols(
                flux, _slices(self.fluxes), self.fluxes, rot, True
            )

        s1 = dm.s1
        s1.gradients = gradients
        s1.fluxes = flux
        s1.internal = dict(new_state)
        return flux, s1.internal_state_variables

    @staticmethod
    def _to_batched(v, n, size, dtype=None):
        """Broadcast scalar / (size,) / (n,) / (n*size,) values to (n, size)."""
        v = jnp.asarray(v, dtype)
        if v.ndim == 0:
            return jnp.full((n, size), v)
        if v.shape == (size,):
            return jnp.broadcast_to(v, (n, size))
        return jnp.reshape(v, (n, size))

    def _assemble_inputs(self, gradients, n):
        parts = [gradients]
        for name, size in self.external_state_variables.items():
            if name in self.external_state:
                v = self._to_batched(self.external_state[name], n, size, gradients.dtype)
            else:
                v = jnp.zeros((n, size), gradients.dtype)
            parts.append(v)
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else gradients

    def _assemble_props(self, n):
        props = {}
        declared = getattr(self.behavior, "material_properties", {})
        for name, size in declared.items():
            v = self.material_property_values.get(name)
            if v is None:
                raise ValueError(f"material property '{name}' has not been set")
            v = self._to_batched(v, n, size)
            props[name] = v[:, 0] if size == 1 else v
        return props

    def _rotate_tangent(self, Ct, ops):
        """C_glob = Q_y^T C_mat Q_x per packed tangent block."""
        parts = []
        pos = 0
        for (y, x), (sy, sx) in self.tangent_blocks.items():
            block = Ct[:, pos : pos + sy * sx].reshape(-1, sy, sx)
            Qy, Qx = ops.get(sy), ops.get(sx)
            if Qy is not None:
                block = jnp.einsum("nji,njk->nik", Qy, block)
            if Qx is not None:
                block = jnp.einsum("nik,nkj->nij", block, Qx)
            parts.append(block.reshape(-1, sy * sx))
            pos += sy * sx
        return jnp.concatenate(parts, axis=1) if parts else Ct

    # ----------------------------------------------------- state dict access
    def get_initial_state_dict(self):
        return self.data_manager.s0.as_dict()

    def get_final_state_dict(self):
        return self.data_manager.s1.as_dict()

    def set_initial_state_dict(self, state: dict):
        for k, v in state.items():
            self.data_manager.s0[k] = v
