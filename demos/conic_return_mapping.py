"""Conic return mapping: non-smooth yield surfaces via EXACT projections.

Rebuild of the reference's cvxpy demo family (reference
demos/cvxpy/cvxpy_return_mapping.py: radial strain paths through Rankine /
L1-Rankine / plane-stress von Mises surfaces, each Gauss point solving a
conic projection — there via a cvxpy solver per point, here via vmapped
closed-form active-set / secular projections, machine-sharp at the vertices).

Drives a fan of radial plane-stress strain paths through each exact material,
prints where each path lands on the yield surface, and writes the stress
paths to CSV for plotting.

Run: python demos/conic_return_mapping.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from dolfinx_materials_tpu.models import (
    L1RankineExact,
    PlaneStressVonMisesExact,
    RankineExact,
)

E, nu = 30e3, 0.2
ft, fc = 3.0, 30.0
sig0 = 5.0


def stress_paths(mat, n_dirs=16, n_steps=24, eps_max=4e-3):
    """Radial strain paths (the reference's plot_stress_paths pattern):
    returns (n_dirs, n_steps, 3) committed stress histories."""
    thetas = np.linspace(0, 2 * np.pi, n_dirs, endpoint=False)
    dirs = np.stack(
        [np.cos(thetas), np.sin(thetas), 0.3 * np.sin(2 * thetas)], axis=1
    )
    out = np.zeros((n_dirs, n_steps, 3))
    for k, d in enumerate(dirs):
        state = mat.init_state()
        for s, amp in enumerate(np.linspace(0, eps_max, n_steps + 1)[1:]):
            eps = jnp.asarray(amp * d)
            flux, state = mat.constitutive_update({"Strain": eps}, state, 0.0)
            out[k, s] = np.asarray(flux["Stress"])
    return out


def main(n_dirs=16):
    mats = {
        "rankine": RankineExact(E, nu, ft, fc),
        "l1rankine": L1RankineExact(E, nu, ft, fc),
        "vonmises_ps": PlaneStressVonMisesExact(E, nu, sig0),
    }
    rows = []
    for name, mat in mats.items():
        paths = stress_paths(mat, n_dirs=n_dirs)
        fin = paths[:, -1]  # final stresses
        T = fin[:, 0] + fin[:, 1]
        R = np.hypot(0.5 * (fin[:, 0] - fin[:, 1]), fin[:, 2] / np.sqrt(2))
        l1, l2 = 0.5 * T + R, 0.5 * T - R
        if name == "rankine":
            on = np.isclose(l1, ft, atol=1e-8) | np.isclose(l2, -fc, atol=1e-8)
        elif name == "l1rankine":
            on = (
                np.isclose(T, ft, atol=1e-8)
                | np.isclose(T, -fc, atol=1e-8)
                | np.isclose(l1 / ft - l2 / fc, 1.0, atol=1e-9)
            )
        else:
            Q = mat.Q
            on = np.isclose(
                np.einsum("ni,ij,nj->n", fin, Q, fin), sig0**2, rtol=1e-9
            )
        print(
            f"{name}: {on.sum()}/{len(on)} paths land exactly ON the surface "
            f"(max |sig| = {np.abs(fin).max():.3f})"
        )
        assert on.all(), f"{name}: every plastic path must end on the surface"
        for k in range(paths.shape[0]):
            for s in range(paths.shape[1]):
                rows.append([hash(name) % 97, k, s, *paths[k, s]])
    np.savetxt(
        "conic_stress_paths.csv",
        np.array(rows),
        delimiter=",",
        header="mat,dir,step,s0,s1,s2",
    )
    print("wrote conic_stress_paths.csv")


if __name__ == "__main__":
    main()
