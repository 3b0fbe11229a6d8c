"""Plane-strain elastoplasticity of a plate under tension (J2 + Voce hardening).

TPU-native rebuild of the reference demo demos/jax/elastoplasticity/
plane_elastoplasticity.py (perforated-plate variant needs unstructured meshing;
here a structured plate, same material/solver pipeline): load stepping, a
force-displacement curve, per-phase timings, VTK output of the accumulated
plastic strain.

Run: python demos/plane_elastoplasticity.py [N]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax

# f64 host demo: force CPU (the axon TPU plugin overrides JAX_PLATFORMS env);
# device throughput is bench.py's job, multi-chip scaling is sharded_scaling.py
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.solvers import solve_adaptive
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_rectangle,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
from dolfinx_materials_tpu.fem.io import write_vtk
from dolfinx_materials_tpu.models import (
    LinearElasticIsotropic,
    VoceHardening,
    vonMisesIsotropicHardening,
)
from dolfinx_materials_tpu.utils.timers import list_timings, reset_timings


def main(N=24):
    E, nu = 70e3, 0.3
    sig0, sigu, b = 350.0, 500.0, 1e3
    Lx, Ly = 1.0, 2.0

    material = Material(
        vonMisesIsotropicHardening(
            LinearElasticIsotropic(E, nu), VoceHardening(sig0, sigu, b)
        )
    )

    mesh = create_rectangle((0, 0), (Lx, Ly), (N, 2 * N), "quad")
    V = FunctionSpace(mesh, degree=2, shape=(2,))
    qmap = QuadratureMap(V, 4, material)
    qmap.register_gradient("Strain", mandel_strain_2d())

    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0.0))
    top_y = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], Ly), 1)
    bc_top = DirichletBC(top_y, 0.0)
    bcs = [DirichletBC(bottom, 0.0), bc_top]

    u = Function(V)
    # host LU linear solves (the reference's MUMPS role) keep this CPU demo
    # brisk; the device Krylov path is showcased in demos/sharded_scaling.py
    problem = NonlinearMaterialProblem(
        qmap,
        u,
        bcs=bcs,
        options={"ksp_type": "lu", "rtol": 1e-8, "atol": 1e-8, "max_it": 30},
    )

    # warm-up (JIT) — reference pattern plane_elastoplasticity.py:146-149
    qmap.update(jnp.asarray(u.x))
    reset_timings()

    # adaptive load stepping with cutback: the clamped-corner singularities +
    # sharp Voce saturation make fixed big steps fail — solve_adaptive handles it
    uy_max = 6 * sig0 / E * Ly
    forces, steps = [], []
    t0 = time.perf_counter()

    def set_load(t):
        bc_top.set(t)

    def on_each(t):
        R_full = np.asarray(problem._residual(jnp.asarray(u.x)))
        steps.append(t)
        forces.append(R_full[top_y].sum())

    orig_solve = problem.solve

    def solve_and_record():
        out = orig_solve()
        if out[0]:
            on_each(float(bc_top.value))
        return out

    problem.solve = solve_and_record
    accepted = solve_adaptive(problem, set_load, uy_max, nsteps0=20)
    wall = time.perf_counter() - t0
    iters = [0] * len(steps)

    p_cells = qmap.project_on("p", ("DG", 0))
    write_vtk(
        "plane_elastoplasticity.vtk",
        mesh,
        cell_data={"p": p_cells},
    )
    np.savetxt(
        "plane_elastoplasticity_force.csv",
        np.column_stack([steps, forces, iters]),
        header="uy force newton_iters",
    )
    print(f"gauss points: {qmap.num_points}, dofs: {V.num_dofs}")
    print(f"{len(steps)} load steps in {wall:.2f}s; max p = {p_cells.max():.4f}")
    list_timings()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 24)
