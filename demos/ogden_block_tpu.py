"""The reference's headline benchmark protocol (homogeneous block), on one TPU chip.

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

This demo runs the reference's Ogden at its ACTUAL parameter set — mu_mfront
= 27778, alpha = 28.8, K = 69444444 Pa (demos/mfront/hyperelasticity/
Ogden.mfront:8-12; our-convention mu = mu_mfront*alpha/2, K verbatim —
pinned by tests/test_ogden_mfront_parity.py; rounds 1-3 benched K=1e9, a
convention slip 14.4x stiffer in bulk) — with the SAME protocol (10 uniform
load steps to 20% strain) at MATCHED element counts, as a HOMOGENEOUS block:

- ``hexahedron``/P1 (default): the structured-stencil fused f32 step at
  matched element counts (N=14 ~ coarse, N=19 ~ fine) — the proxy-
  discretization row;
- ``tetrahedron``/P2 (``tet``): the reference's exact discretization
  (P2 tets, Keast quadrature) through the banded lane-gather engine, run
  MIXED-PRECISION (f64 residual path + symmetric-diagonally-scaled f32 CG,
  rigid-body-mode coarse space) so per-step RELATIVE residuals reach the
  reference's f64 territory instead of the f32 floor.

The reference's composite benchmark (the block is actually reinforced by
eight quasi-rigid SVK sphere inclusions) lives in
demos/composite_hyperelasticity_tpu.py — THAT is the apples-to-apples row;
this homogeneous protocol isolates the discretization/engine speed.

Run: python demos/ogden_block_tpu.py [N] [n_newton] [n_cg] [tet]
CI exercises main(N=3) (tests/test_demos_smoke.py); real-hardware numbers
land in bench.py's `ogden3d_*` extras and docs/perf.md.
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
from dolfinx_materials_tpu.parallel import (
    device_mesh,
    make_sharded_newton_step,
    make_sharded_newton_step_general,
)

REF = {  # reference timing_results.csv, total = constitutive + linear solve
    "coarse (~3k elements)": {1: 18.5, 2: 10.05, 4: 6.11, 8: 5.46},
    "fine (~6.7k elements)": {1: 88.3, 2: 57.72, 4: 37.02, 8: 20.0},
}
#: the reference Ogden.mfront parameters in our convention
OGDEN_PARAMS = dict(mu=(27778.0 * 28.8 / 2.0,), alpha=(28.8,), K=69444444.0)


def build(N, cell_type="hexahedron", degree=1):
    """``cell_type="tetrahedron", degree=2`` matches the reference protocol's
    P2 tets exactly (its meshes are gmsh P2 tets, hyperelasticity.py); the
    tet dofmap routes the fused step through the banded lane-gather engine
    instead of the structured stencil."""
    mat = Material(Ogden(**OGDEN_PARAMS))
    mesh = create_unit_cube(N, N, N, cell_type)
    V = FunctionSpace(mesh, degree=degree, shape=(3,))
    qmap = QuadratureMap(V, 2 * degree, mat)
    qmap.register_gradient("F", deformation_gradient_3d())
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 2], 0.0))
    top_z = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 2], 1.0), 2)
    bc_top = DirichletBC(top_z, 0.0)
    return mat, qmap, V, [DirichletBC(bottom, 0.0), bc_top], bc_top


def run_10_steps(N, n_newton=20, n_cg=150, n_devices=1,
                 cell_type="hexahedron", degree=1, precision="f32",
                 rtol=None, cg_rtol=None, coarse_modes="p1"):
    """Build + run the 10-step compression; returns (u, warm seconds,
    per-step |R|, per-step |R0|). ``precision="mixed"`` routes through the
    general fused step (f64 residuals, scaled f32 CG, geometric P2->P1
    coarse space by default — measured the cheapest per-CG-iteration
    two-level transfer on this protocol, docs/perf.md round-5 study;
    ``coarse_modes="rbm"`` restores the box-RBM space)."""
    mixed = precision == "mixed"
    if mixed and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    mat, qmap, V, bcs, bc_top = build(N, cell_type, degree)
    prob = NonlinearMaterialProblem(qmap, Function(V), bcs=bcs)
    if mixed:
        step, _ = make_sharded_newton_step_general(
            prob, device_mesh(n_devices), n_newton=n_newton, n_cg=n_cg,
            rtol=rtol if rtol is not None else 1e-4,
            cg_rtol=cg_rtol if cg_rtol is not None else 1e-3,
            precision="mixed", coarse_modes=coarse_modes, return_info=True,
        )
    else:
        step, _ = make_sharded_newton_step(
            qmap, prob, device_mesh(n_devices), n_newton=n_newton,
            n_cg=n_cg, rtol=rtol if rtol is not None else 2e-5,
        )
    mask, _ = combine_bcs(bcs, V.num_dofs)
    mask = jnp.asarray(mask)
    # explicit dtype: the f32 protocol must stay f32 even if a previous
    # mixed-precision run enabled x64 in this process
    fdt = jnp.float64 if mixed else jnp.float32
    # the scan carry must be shape-stable: seed with the TRIMMED (real-point)
    # state — step() pads internally and returns trimmed
    st0 = jax.tree.map(
        lambda a: jnp.asarray(a, fdt), mat.data_manager.s0.internal
    )
    bc_vals = []
    for ez in np.linspace(0, 0.2, 11)[1:]:
        bc_top.set(-float(ez))
        _, vals = combine_bcs(bcs, V.num_dofs)
        bc_vals.append(jnp.asarray(vals, fdt))
    vals_stack = jnp.stack(bc_vals)

    # ALL 10 load steps in ONE dispatch: a lax.scan over the bc-value
    # schedule (the step body compiles once). Through the axon tunnel each
    # dispatch costs ~50 ms (docs/perf.md "Measurement pitfalls"), so the
    # Python-loop version pays ~0.5 s of pure dispatch on a ~2 s solve.
    @jax.jit
    def run_scan(u0, s0):
        def body(carry, vals):
            u, u_prev, st = carry
            # secant load-step predictor: uniform load increments, so the
            # previous step's displacement increment extrapolates the next
            # solution to second order — Newton starts ~one quadratic step
            # from converged instead of from the last converged state
            guess = u + (u - u_prev)
            if mixed:
                un, sts, rn, rn0 = step(guess, [st], mask, vals, 0.0)
                return (un, u, sts[0]), (rn, rn0)
            un, st, rn = step(guess, st, mask, vals, 0.0)
            return (un, u, st), (rn, rn * 0 + 1.0)

        (u, _, _), rns = jax.lax.scan(body, (u0, u0, s0), vals_stack)
        return u, rns

    def run_all():
        u, (rns, rn0s) = run_scan(jnp.zeros(V.num_dofs, fdt), st0)
        jax.block_until_ready(u)
        return u, np.asarray(rns), np.asarray(rn0s)

    ne = N**3 * (6 if cell_type == "tetrahedron" else 1)
    print(f"N={N}: {ne} {cell_type[:3]} elements (P{degree}), {V.num_dofs} "
          f"dofs, {qmap.num_points} Gauss points, {n_newton} Newton x "
          f"{n_cg} CG ({precision}), {n_devices} device(s)")
    t0 = time.perf_counter()
    u, rns, rn0s = run_all()
    t_first = time.perf_counter() - t0
    # milestone JSON line: a bench phase killed during the warm rep still
    # records that the compile + first full run finished, and in how long
    import json as _json
    _tag = "tet_p2" if (cell_type == "tetrahedron" and degree == 2) else "hex_p1"
    print(_json.dumps({f"{_tag}_first_run_s": round(t_first, 2)}), flush=True)
    t0 = time.perf_counter()
    u, rns, rn0s = run_all()
    t_warm = time.perf_counter() - t0
    print(f"  first (incl. compile): {t_first:.1f}s   "
          f"warm 10-step total: {t_warm:.2f}s")
    if precision == "mixed":
        rel = rns / np.maximum(rn0s, 1e-300)
        print("  per-step rel |R|: " + " ".join(f"{r:.1e}" for r in rel))
    else:
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
    return u, t_warm, rns, rn0s


def main(N=14, n_newton=20, n_cg=150, cell_type="hexahedron", degree=1,
         precision="f32"):
    run_10_steps(N, n_newton, n_cg,
                 n_devices=1 if jax.default_backend() == "tpu"
                 else min(8, jax.device_count()),
                 cell_type=cell_type, degree=degree, precision=precision)


def bench_json(N=8, n_newton=25, n_cg=50):
    """Driver-facing subprocess entry: the tet-P2 mixed protocol, one JSON
    line on stdout (bench.py merges every JSON line a phase prints).

    Round-5 config (telemetry study, docs/perf.md): truncated-CG inexact
    Newton at a 50-iteration budget + the P1 geometric coarse space +
    rtol=1e-4 (per-step f64 rel |R| lands at ~2e-5, well under the 1e-4
    bar) — measured 4.35 s vs the reference's 5.46 s @8 MPI ranks."""
    import json

    from dolfinx_materials_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    u, t_warm, rns, rn0s = run_10_steps(
        N, n_newton, n_cg, n_devices=1, cell_type="tetrahedron", degree=2,
        precision="mixed",
    )
    rel = (rns / np.maximum(rn0s, 1e-300)).tolist()
    print(json.dumps({
        "tet_p2_10steps_s": float(t_warm),
        "tet_p2_rel_R": rel,
        "ogden_K": OGDEN_PARAMS["K"],
    }))


def bench_json_hex(N=14, n_newton=20, n_cg=100):
    """Driver-facing subprocess entry: the homogeneous P1-hex proxy row
    (structured stencil, f32) kept for r1-r5 continuity."""
    import json

    from dolfinx_materials_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    u, t_warm, rns, _ = run_10_steps(N, n_newton, n_cg, n_devices=1)
    print(json.dumps({
        "hex_p1_10steps_s": float(t_warm),
        "hex_p1_final_residual": float(rns[-1]),
    }))


if __name__ == "__main__":
    # ogden_block_tpu.py [N] [n_newton] [n_cg] [tet] | --bench [hex] [N nn ncg]
    if "--bench" in sys.argv:
        args = [int(a) for a in sys.argv[1:] if a.isdigit()]
        if "hex" in sys.argv:
            bench_json_hex(*(args[:3]))
        else:
            bench_json(*(args[:3]))
        sys.exit(0)
    # "tet" switches to the reference protocol's P2 tetrahedra (N=8 matches
    # the coarse ~3k-element mesh, N=10 the fine ~6.7k one), run mixed-
    # precision so per-step relative residuals are f64-honest
    tet = len(sys.argv) > 4 and sys.argv[4].startswith("tet")
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else (8 if tet else 14),
        int(sys.argv[2]) if len(sys.argv) > 2 else 20,
        int(sys.argv[3]) if len(sys.argv) > 3 else 150,
        cell_type="tetrahedron" if tet else "hexahedron",
        degree=2 if tet else 1,
        precision="mixed" if tet else "f32",
    )
