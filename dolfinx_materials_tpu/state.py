"""HBM-resident SoA material state with s0/s1 double-buffering.

Rebuild of the reference's state protocol (dolfinx_materials/generic.py:204-295 and
the jaxmat DataManager, dolfinx_materials/jaxmat.py:30-43) as immutable jnp pytrees:

- per-Gauss-point internal state is a pytree ``dict[str, array]`` produced by
  ``behavior.init_state()``; the batched store simply adds a leading point axis to
  every leaf, so ``jax.vmap`` consumes it directly with zero conversion cost
  (the reference pays explicit pytree<->flat-dict converters each call,
  jaxmat.py:72-114 — here the SoA layout *is* the pytree),
- ``s0`` (converged) / ``s1`` (trial) double buffer with ``update()`` (commit) and
  ``revert()`` (load-step cutback), matching generic.py:204-216,
- name-indexed flat views for I/O, checkpointing and the QuadratureMap scatter,
  matching the reference's column-slice accessors (generic.py:236-295).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _leaf_width(shape) -> int:
    return int(np.prod(shape)) if len(shape) else 1


class MaterialStateManager:
    """One buffer of batched state: gradients, fluxes and internal variables.

    ``gradients``/``fluxes`` are flat ``(n, total)`` arrays (they are consumed flat by
    the FEM scatter); ``internal`` is the batched behavior pytree.
    """

    def __init__(self, behavior, ngauss: int, dtype=None):
        self.behavior = behavior
        self.n = ngauss
        dtype = dtype or jnp.zeros(0).dtype
        self.dtype = dtype
        self.gradients_size = sum(behavior.gradients.values())
        self.fluxes_size = sum(behavior.fluxes.values())
        self.gradients = jnp.zeros((ngauss, self.gradients_size), dtype)
        self.fluxes = jnp.zeros((ngauss, self.fluxes_size), dtype)
        point_state = behavior.init_state()
        self.internal = jax.tree.map(
            lambda x: jnp.broadcast_to(
                jnp.asarray(x, dtype), (ngauss,) + jnp.shape(jnp.asarray(x))
            ).copy(),
            point_state,
        )
        # name -> column slice maps, in declaration order
        self._grad_slices = _slices(behavior.gradients)
        self._flux_slices = _slices(behavior.fluxes)
        self.internal_state_sizes = {
            k: _leaf_width(jnp.shape(v)) for k, v in point_state.items()
        }
        self._isv_slices = _slices(self.internal_state_sizes)
        self.internal_size = sum(self.internal_state_sizes.values())

    # -- flat ISV view ------------------------------------------------------
    @property
    def internal_state_variables(self) -> jnp.ndarray:
        """Flat ``(n, total_isv)`` view of the internal-state pytree."""
        if not self.internal:
            return jnp.zeros((self.n, 0), self.dtype)
        cols = [jnp.reshape(self.internal[k], (self.n, -1)) for k in self.internal]
        return jnp.concatenate(cols, axis=1)

    def set_internal_from_flat(self, arr: jnp.ndarray) -> None:
        for k, sl in self._isv_slices.items():
            leaf = self.internal[k]
            self.internal[k] = jnp.reshape(arr[:, sl], leaf.shape).astype(leaf.dtype)

    # -- name-indexed access (reference protocol, generic.py:236-295) -------
    def __getitem__(self, name: str) -> jnp.ndarray:
        if name in self._grad_slices:
            return self.gradients[:, self._grad_slices[name]]
        if name in self._flux_slices:
            return self.fluxes[:, self._flux_slices[name]]
        if name in self.internal:
            return jnp.reshape(self.internal[name], (self.n, -1))
        raise KeyError(f"Unknown state field '{name}'")

    def __setitem__(self, name: str, value) -> None:
        value = jnp.asarray(value, self.dtype)
        size = self._field_size(name)
        if value.ndim == 0:
            value = jnp.full((self.n, size), value)
        elif value.ndim == 1:
            if value.shape[0] == self.n:
                value = jnp.broadcast_to(value[:, None], (self.n, size))
            else:
                value = jnp.broadcast_to(value, (self.n, size))
        if name in self._grad_slices:
            self.gradients = self.gradients.at[:, self._grad_slices[name]].set(value)
        elif name in self._flux_slices:
            self.fluxes = self.fluxes.at[:, self._flux_slices[name]].set(value)
        elif name in self.internal:
            leaf = self.internal[name]
            self.internal[name] = jnp.reshape(value, leaf.shape).astype(leaf.dtype)
        else:
            raise KeyError(f"Unknown state field '{name}'")

    def _field_size(self, name: str) -> int:
        if name in self._grad_slices:
            sl = self._grad_slices[name]
            return sl.stop - sl.start
        if name in self._flux_slices:
            sl = self._flux_slices[name]
            return sl.stop - sl.start
        if name in self.internal_state_sizes:
            return self.internal_state_sizes[name]
        raise KeyError(f"Unknown state field '{name}'")

    def keys(self):
        return (
            list(self._grad_slices) + list(self._flux_slices) + list(self.internal)
        )

    def as_dict(self) -> dict:
        return {k: np.asarray(self[k]) for k in self.keys()}

    def copy(self) -> "MaterialStateManager":
        new = object.__new__(MaterialStateManager)
        new.__dict__.update(self.__dict__)
        new.internal = dict(self.internal)
        return new


def _slices(sizes: dict) -> dict:
    out, pos = {}, 0
    for name, size in sizes.items():
        out[name] = slice(pos, pos + size)
        pos += size
    return out


class DataManager:
    """s0/s1 double buffer with commit/revert (reference: generic.py:204-216)."""

    def __init__(self, behavior, ngauss: int, dtype=None):
        self.s0 = MaterialStateManager(behavior, ngauss, dtype)
        self.s1 = MaterialStateManager(behavior, ngauss, dtype)
        self.n = ngauss

    def update(self) -> None:
        """Commit the trial state: s0 <- s1 (after global convergence)."""
        self.s0 = self.s1.copy()

    def revert(self) -> None:
        """Load-step cutback: s1 <- s0."""
        self.s1 = self.s0.copy()
