"""3D finite-strain FeFp elastoplasticity: tension of a bar (hex mesh).

TPU-native rebuild of the reference demo demos/jax/finite_strain_elastoplasticity
(necking rod on GPU+MPI; here a structured bar, same FeFp J2 material with Voce
saturation, PK1/F work conjugates, device-resident state).

Run: python demos/finite_strain_elastoplasticity.py [N]
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
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_box,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.forms import deformation_gradient_3d
from dolfinx_materials_tpu.fem.io import write_vtk
from dolfinx_materials_tpu.models import FeFpJ2Plasticity, LinearElasticIsotropic
from dolfinx_materials_tpu.solvers import solve_adaptive


def main(N=4):
    E, nu = 70e3, 0.3
    sig0, sigu, b = 500.0, 750.0, 1e2

    def yield_stress(p):
        return sig0 + (sigu - sig0) * (1 - jnp.exp(-b * p))

    material = Material(FeFpJ2Plasticity(LinearElasticIsotropic(E, nu), yield_stress))

    L, W = 3.0, 1.0
    mesh = create_box((0, 0, 0), (L, W, W), (3 * N, N, N), "hexahedron")
    V = FunctionSpace(mesh, degree=1, shape=(3,))
    qmap = QuadratureMap(V, 2, material)
    qmap.register_gradient("F", deformation_gradient_3d())

    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0.0))
    right_x = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], L), 0)
    bc_right = DirichletBC(right_x, 0.0)
    bcs = [DirichletBC(left, 0.0), bc_right]

    u = Function(V)
    problem = NonlinearMaterialProblem(
        qmap, u, bcs=bcs, options={"ksp_type": "lu", "rtol": 1e-8, "max_it": 30}
    )

    stretch = 0.05  # 5% elongation
    t0 = time.perf_counter()
    accepted = solve_adaptive(
        problem, lambda t: bc_right.set(t), stretch * L, nsteps0=10
    )
    wall = time.perf_counter() - t0

    p_cells = qmap.project_on("p", ("DG", 0))
    write_vtk("finite_strain_bar.vtk", mesh, cell_data={"p": p_cells})
    PK1 = np.asarray(material.data_manager.s0["PK1"])
    print(f"gauss points: {qmap.num_points}, dofs: {V.num_dofs}")
    print(
        f"{len(accepted)} steps in {wall:.1f}s; max p = {p_cells.max():.4f}; "
        f"mean PK1_xx = {PK1[:, 0].mean():.1f}"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
