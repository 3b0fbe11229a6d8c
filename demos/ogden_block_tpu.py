"""The reference's own headline benchmark, end-to-end on one TPU chip.

The reference's ONLY committed wall-clock numbers are the 3D Ogden
hyperelasticity timing study (reference demos/mfront/hyperelasticity/
timing_results.csv): 10 load steps to 20% strain, MFront Ogden constitutive
law, ~3,000-element coarse / ~6,700-element fine meshes, 1-8 MPI ranks
(CPU, P2 tets, GMRES+GAMG, f64):

    mesh    ranks   constitutive   linear solve   total
    coarse  1       0.60 s         17.9 s         18.5 s
    coarse  8       0.21 s         5.25 s         5.46 s
    fine    1       1.36 s         86.94 s        88.3 s
    fine    8       0.40 s         19.6 s         20.0 s

This demo runs the SAME constitutive model (Ogden, mu=0.4 MPa, alpha=28.8,
K=1 GPa — the reference's mfront_materials/Ogden.mfront parameter set), the
SAME protocol (10 uniform load steps to 20% strain) at MATCHED element
counts (N=14 -> 2,744 hexes ~ coarse; N=19 -> 6,859 hexes ~ fine) through
the fully-fused sharded Newton step: constitutive update + assembly +
two-level-preconditioned CG, one XLA program per load step.

Measured on one v5e chip (f32, early-exit Newton at rtol=2e-5, warm):

    coarse  ~1.9-4.4 s  for all 10 steps  (ref 1 rank: 18.5 s, 8: 5.46 s)
    fine    ~4.9 s      for all 10 steps  (ref 1 rank: 88.3 s, 8: 20.0 s)

Honest deltas vs the reference protocol: single-material block in uniaxial
compression (the reference block carries quasi-rigid SVK sphere inclusions —
its E_pen=1e12 contrast is out of f32-CG reach), and f32 with early-exit
residuals. The DISCRETIZATION delta is closed: the ``tet`` mode runs the
reference's exact P2 tetrahedra at matched element counts (N=8 ~ coarse,
N=10 ~ fine; 14-point Keast quadrature) through the banded lane-gather
engine + the coordinate-box two-level PC — recorded by bench.py as
``ogden3d_tet_p2_solve_10steps_s``. f32 caveat (the reference solves
to snes_rtol 1e-8 in f64; the f32 residual floor here is set by K=1e9 —
roundoff ~K*eps_f32 = 60 Pa per Gauss point). Measured f32 accuracy: running
the IDENTICAL 10-step protocol at N=4 in f32-TPU (20 Newton x 100 CG,
rtol=2e-5) vs f64-CPU (rtol=1e-11, final |R| ~ 8e-8) gives a maximum
displacement error of 3.4e-5 relative to |u|max — engineering-converged. The
constitutive-vs-solve split the reference reports is not reproduced here
because the fused step deliberately erases that boundary — one program.

Run: python demos/ogden_block_tpu.py [N] [n_newton] [n_cg]
CI exercises main(N=4) (tests/test_demos_smoke.py); real-hardware numbers
land in bench.py's `ogden3d_solve_10steps_s` extra and docs/perf.md.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_unit_cube,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.bc import combine_bcs
from dolfinx_materials_tpu.fem.forms import deformation_gradient_3d
from dolfinx_materials_tpu.models import Ogden
from dolfinx_materials_tpu.parallel import device_mesh, make_sharded_newton_step

REF = {  # reference timing_results.csv, total = constitutive + linear solve
    "coarse (~3k elements)": {1: 18.5, 2: 10.05, 4: 6.11, 8: 5.46},
    "fine (~6.7k elements)": {1: 88.3, 2: 57.72, 4: 37.02, 8: 20.0},
}


def build(N, cell_type="hexahedron", degree=1):
    """``cell_type="tetrahedron", degree=2`` matches the reference protocol's
    P2 tets exactly (its meshes are gmsh P2 tets, hyperelasticity.py); the
    tet dofmap routes the fused step through the banded lane-gather engine
    instead of the structured stencil."""
    mat = Material(Ogden(mu=(0.4e6,), alpha=(28.8,), K=1e9))
    mesh = create_unit_cube(N, N, N, cell_type)
    V = FunctionSpace(mesh, degree=degree, shape=(3,))
    qmap = QuadratureMap(V, 2 * degree, mat)
    qmap.register_gradient("F", deformation_gradient_3d())
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 2], 0.0))
    top_z = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 2], 1.0), 2)
    bc_top = DirichletBC(top_z, 0.0)
    return mat, qmap, V, [DirichletBC(bottom, 0.0), bc_top], bc_top


def run_10_steps(N, n_newton=20, n_cg=150, n_devices=1,
                 cell_type="hexahedron", degree=1):
    """Build + run the 10-step compression; returns (u, warm seconds,
    per-step |R|)."""
    mat, qmap, V, bcs, bc_top = build(N, cell_type, degree)
    prob = NonlinearMaterialProblem(qmap, Function(V), bcs=bcs)
    step, pad_state = make_sharded_newton_step(
        qmap, prob, device_mesh(n_devices), n_newton=n_newton, n_cg=n_cg,
        rtol=2e-5,
    )
    mask, _ = combine_bcs(bcs, V.num_dofs)
    mask = jnp.asarray(mask)
    # the scan carry must be shape-stable: seed with the TRIMMED (real-point)
    # state — step() pads internally and returns trimmed
    st0 = jax.tree.map(jnp.asarray, mat.data_manager.s0.internal)
    bc_vals = []
    for ez in np.linspace(0, 0.2, 11)[1:]:
        bc_top.set(-float(ez))
        _, vals = combine_bcs(bcs, V.num_dofs)
        bc_vals.append(jnp.asarray(vals))
    vals_stack = jnp.stack(bc_vals)

    # ALL 10 load steps in ONE dispatch: a lax.scan over the bc-value
    # schedule (the step body compiles once). Through the axon tunnel each
    # dispatch costs ~50 ms (docs/perf.md "Measurement pitfalls"), so the
    # Python-loop version pays ~0.5 s of pure dispatch on a ~2 s solve.
    @jax.jit
    def run_scan(u0, s0):
        def body(carry, vals):
            u, st = carry
            u, st, rn = step(u, st, mask, vals, 0.0)
            return (u, st), rn

        (u, _), rns = jax.lax.scan(body, (u0, s0), vals_stack)
        return u, rns

    def run_all():
        u, rns = run_scan(jnp.zeros(V.num_dofs), st0)
        jax.block_until_ready(u)
        return u, [float(r) for r in rns]

    ne = N**3 * (6 if cell_type == "tetrahedron" else 1)
    print(f"N={N}: {ne} {cell_type[:3]} elements (P{degree}), {V.num_dofs} "
          f"dofs, {qmap.num_points} Gauss points, {n_newton} Newton x "
          f"{n_cg} CG, {n_devices} device(s)")
    t0 = time.perf_counter()
    u, rns = run_all()
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    u, rns = run_all()
    t_warm = time.perf_counter() - t0
    print(f"  first (incl. compile): {t_first:.1f}s   "
          f"warm 10-step total: {t_warm:.2f}s")
    print("  per-step |R|: " + " ".join(f"{r:.1e}" for r in rns))
    if cell_type == "tetrahedron" and degree == 2:
        label = ("coarse (~3k elements)" if N == 8
                 else "fine (~6.7k elements)" if N == 10 else None)
    else:
        label = ("coarse (~3k elements)" if N == 14
                 else "fine (~6.7k elements)" if N == 19 else None)
    if label:
        ref = REF[label]
        print(f"  reference {label}, 10-step total: "
              + ", ".join(f"{r}s @{k} rank(s)" for k, r in ref.items()))
        print(f"  speedup vs 1 rank: {ref[1] / t_warm:.1f}x,  "
              f"vs 8 ranks: {ref[8] / t_warm:.1f}x  (one chip)")
    return u, t_warm, rns


def main(N=14, n_newton=20, n_cg=150, cell_type="hexahedron", degree=1):
    run_10_steps(N, n_newton, n_cg,
                 n_devices=1 if jax.default_backend() == "tpu"
                 else min(8, jax.device_count()),
                 cell_type=cell_type, degree=degree)


if __name__ == "__main__":
    # ogden_block_tpu.py [N] [n_newton] [n_cg] [tet]
    # "tet" switches to the reference protocol's P2 tetrahedra (N=8 matches
    # the coarse ~3k-element mesh, N=10 the fine ~6.7k one)
    tet = len(sys.argv) > 4 and sys.argv[4].startswith("tet")
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else (8 if tet else 14),
        int(sys.argv[2]) if len(sys.argv) > 2 else 20,
        int(sys.argv[3]) if len(sys.argv) > 3 else 150,
        cell_type="tetrahedron" if tet else "hexahedron",
        degree=2 if tet else 1,
    )
