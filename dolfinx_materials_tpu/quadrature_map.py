"""QuadratureMap: binds a Material to the Gauss points of a (sub)domain.

Rebuild of the reference's central object (dolfinx_materials/quadrature_map.py:
34-401) on the TPU-native FEM layer:

- ``register_gradient(name, expr)`` registers a kinematic expression (a jnp
  function of the local field context — forms.py) instead of a UFL expression;
  its variation for tangent assembly is JAX AD instead of ``ufl.derivative``
  (reference :197-218 + quadrature_function.py:53-60);
- ``update(u)`` evaluates all gradients at Gauss points (one fused gather/einsum
  kernel), runs the batched constitutive update on device, and keeps flux/tangent
  arrays HBM-resident — no host scatter at all (the reference pays numpy copies
  both ways, :305-313 and :331-348);
- ``advance()`` commits s1 -> s0 after global convergence (:350-360);
- cell subsets enable multi-material problems (:64-73, tests/mfront/
  test_multimaterials.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .fem.assembly import QuadratureDomain, project_dg0
from .fem.space import FunctionSpace
from .material import Material
from .utils.timers import timer


class QuadratureMap:
    def __init__(
        self,
        space: FunctionSpace,
        deg_quad: int,
        material: Material,
        cells=None,
        check_nans: bool = False,
        weight=None,
    ):
        self.space = space
        self.material = material
        self.domain = QuadratureDomain(space, deg_quad, cells, weight=weight)
        material.set_data_manager(self.domain.num_points)
        self.dt = 0.0
        #: assert flux/tangent finiteness after every integration (the
        #: reference's NaN assertions, quadrature_map.py:322-324). Off by
        #: default: even the reduced-scalar form costs one blocking host sync
        #: per Newton iteration; solvers/tests opt in for debugging.
        self.check_nans = check_nans

        self.gradient_exprs: dict = {}
        self.esv_exprs: dict = {}
        self._eval_fns: dict = {}
        self._flux = None
        self._Ct = None
        self._initialized = False

        # packed tangent-block layout (reference quadrature_map.py:83-105)
        self._block_slices = {}
        pos = 0
        for (y, x), (sy, sx) in material.tangent_blocks.items():
            self._block_slices[(y, x)] = (slice(pos, pos + sy * sx), sy, sx)
            pos += sy * sx

    # ------------------------------------------------------------ registration
    def register_gradient(self, name: str, expr):
        if name not in self.material.gradients:
            raise KeyError(
                f"behavior declares gradients {list(self.material.gradients)}, "
                f"not '{name}'"
            )
        self.gradient_exprs[name] = expr
        self._eval_fns[name] = self.domain.make_eval(expr)

    def register_external_state_variable(self, name: str, expr_or_values):
        """Register an ESV as a constant/array or as an expression of u
        (reference :174-195)."""
        if callable(expr_or_values):
            self.esv_exprs[name] = expr_or_values
            self._eval_fns[name] = self.domain.make_eval(expr_or_values)
        else:
            self.material.update_external_state_variable(name, expr_or_values)

    # ---------------------------------------------------------------- update
    def update(self, u):
        """Constitutive update driver (reference :297-334): gradients at Gauss
        points -> batched material integrate -> device-resident flux/tangents."""
        u = jnp.asarray(u)
        missing = [g for g in self.material.gradients if g not in self.gradient_exprs]
        if missing:
            raise RuntimeError(f"gradients not registered: {missing}")

        with timer("qmap: external state variable update"):
            for name in self.esv_exprs:
                self.material.update_external_state_variable(
                    name, self._eval_fns[name](u)
                )

        with timer("qmap: gradients evaluation"):
            grads = [self._eval_fns[g](u) for g in self.material.gradients]
            grad_vals = jnp.concatenate(grads, axis=1) if len(grads) > 1 else grads[0]

        with timer("qmap: material integration"):
            flux, isv, Ct = self.material.integrate(grad_vals, self.dt)

        if self.check_nans:
            # one reduced scalar per array, one host sync total (not a full
            # device->host copy of every state array)
            sums = jnp.stack([jnp.sum(flux), jnp.sum(isv), jnp.sum(Ct)])
            finite = np.isfinite(np.asarray(sums))
            if not finite.all():
                names = [
                    n
                    for n, ok in zip(("flux", "isv", "tangent"), finite)
                    if not ok
                ]
                raise FloatingPointError(
                    f"Material integration of {self.material.name} produced "
                    f"non-finite {', '.join(names)} values"
                )

        self._flux = flux
        self._Ct = Ct
        return flux, Ct

    def update_flux_only(self, u):
        """Tangent-free constitutive update (line-search residual trials):
        gradients at Gauss points -> flux + new state, NO jacfwd pass. The
        cached tangent (``self._Ct``) is left untouched; a full :meth:`update`
        follows at the accepted iterate before the next Jacobian assembly."""
        u = jnp.asarray(u)
        with timer("qmap: external state variable update"):
            for name in self.esv_exprs:
                self.material.update_external_state_variable(
                    name, self._eval_fns[name](u)
                )
        with timer("qmap: gradients evaluation"):
            grads = [self._eval_fns[g](u) for g in self.material.gradients]
            grad_vals = jnp.concatenate(grads, axis=1) if len(grads) > 1 else grads[0]
        with timer("qmap: material integration (flux-only)"):
            flux, _ = self.material.integrate_flux_only(grad_vals, self.dt)
        self._flux = flux
        return flux

    def advance(self):
        """Commit converged state and expose final fields (reference :350-360)."""
        self.material.data_manager.update()

    def revert(self):
        self.material.data_manager.revert()

    # ------------------------------------------------------------- accessors
    @property
    def num_points(self):
        return self.domain.num_points

    @property
    def cells(self):
        return self.domain.cells

    def flux_array(self, name: str):
        """Current (trial) flux values (npoints, size)."""
        return self.material.data_manager.s1[name]

    def field_array(self, name: str):
        """Any state field by name from the trial state."""
        return self.material.data_manager.s1[name]

    def tangent_block(self, y: str, x: str):
        """(npoints, sy, sx) view of one consistent-tangent block."""
        sl, sy, sx = self._block_slices[(y, x)]
        return self._Ct[:, sl].reshape(-1, sy, sx)

    # ---------------------------------------------------- state initialization
    def update_initial_state(self, field: str, value):
        """Set a converged-state field from scalar/array/callable(coords)
        (reference :262-279, tests/mfront/test_initialization.py)."""
        if callable(value):
            xq = np.asarray(self.domain.x_q).reshape(self.num_points, -1)
            value = np.asarray(value(xq))
        self.material.data_manager.s0[field] = value
        self.material.data_manager.s1[field] = value

    # ---------------------------------------------------------- postprocessing
    def project_on(self, name: str, kind=("DG", 0), smooth=None):
        """Project a quadrature state field (reference :362-401):
        ``("DG", 0)`` -> cell averages (ne, k);
        ``("P"|"CG", deg)`` -> continuous Lagrange L2 projection, returning
        ``(FunctionSpace, dof values (nnodes, k))``. ``smooth`` (CG only)
        applies the reference's Helmholtz filter of that length
        (utils.py:51-53): the projection operator gains
        ``smooth**2 ∫ grad(Pv).grad(w) dx``.

        Prefix collection (reference quadrature_map.py:377-387): if ``name``
        is not an exact field, all fields starting with ``name`` are
        collected (sorted) and stacked into one vector field — the way the
        reference aggregates MFront array-valued ISVs whose bracketed names
        were flattened (``p[0]`` -> ``p0`` ...). Array-valued ISVs stored
        natively (crystal ``p`` (12,)) already project by exact name."""
        import jax.numpy as jnp

        s1 = self.material.data_manager.s1
        try:
            vals = s1[name]
        except KeyError:
            matches = sorted(k for k in s1.keys() if k.startswith(name))
            if not matches:
                raise KeyError(
                    f"no state field named or prefixed '{name}' "
                    f"(fields: {s1.keys()})"
                ) from None
            vals = jnp.concatenate(
                [jnp.reshape(s1[k], (self.num_points, -1)) for k in matches],
                axis=1,
            )
        if kind[0] in ("DG", "dg") and kind[1] == 0:
            return np.asarray(project_dg0(self.domain, vals))
        if kind[0] in ("P", "CG", "Lagrange"):
            from .fem.assembly import project_cg

            return project_cg(self.domain, vals, degree=kind[1], smooth=smooth)
        raise NotImplementedError(kind)
