"""Checkpoint / resume for material state and solution fields.

The reference has NO serialization (SURVEY.md §5): state lives in the s0/s1
double buffer and restart is only possible via ``update_initial_state``
(reference quadrature_map.py:262-279). Here we add the missing capability:
save/load of the full SoA state (gradients, fluxes, internal pytree) plus any dof
vectors, as a flat .npz (host) — the state arrays are exactly the name-keyed SoA
columns, so the format is stable and framework-agnostic. ``restore`` feeds them
back through the same setters ``update_initial_state`` uses.
"""

from __future__ import annotations

import numpy as np


def save_state(path, qmap, extra: dict | None = None):
    """Serialize a QuadratureMap's converged (s0) state + optional extra arrays."""
    dm = qmap.material.data_manager
    payload = {}
    s0 = dm.s0
    payload["__gradients__"] = np.asarray(s0.gradients)
    payload["__fluxes__"] = np.asarray(s0.fluxes)
    for k in s0.internal:
        payload[f"isv::{k}"] = np.asarray(s0.internal[k])
    payload["__cells__"] = np.asarray(qmap.cells)
    for k, v in (extra or {}).items():
        payload[f"extra::{k}"] = np.asarray(v)
    np.savez(path, **payload)


def load_state(path, qmap):
    """Restore a QuadratureMap's state (both s0 and s1) from ``save_state`` output.

    Returns the dict of extra arrays saved alongside.
    """
    import jax.numpy as jnp

    data = np.load(path)
    dm = qmap.material.data_manager
    n_ckpt = data["__gradients__"].shape[0]
    n_here = np.asarray(dm.s0.gradients).shape[0]
    if n_ckpt != n_here:
        raise ValueError(
            f"checkpoint holds {n_ckpt} Gauss points but this QuadratureMap "
            f"has {n_here} (different mesh or quadrature degree?) — refusing "
            "to load a mismatched state"
        )
    for s in (dm.s0, dm.s1):
        s.gradients = jnp.asarray(data["__gradients__"])
        s.fluxes = jnp.asarray(data["__fluxes__"])
        for k in list(s.internal):
            want = np.asarray(s.internal[k]).shape
            got = data[f"isv::{k}"].shape
            if want != got:
                raise ValueError(
                    f"checkpoint ISV '{k}' has shape {got}, expected {want}"
                )
            s.internal[k] = jnp.asarray(data[f"isv::{k}"])
    return {
        k.split("::", 1)[1]: data[k] for k in data.files if k.startswith("extra::")
    }
