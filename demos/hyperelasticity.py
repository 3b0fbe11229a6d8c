"""3D Ogden hyperelasticity: compression of a block + timing breakdown.

TPU-native rebuild of the reference demo demos/mfront/hyperelasticity (Ogden
matrix, MPI timing study -> here a single-process timing breakdown; multi-chip
scaling lives in demos/sharded_scaling.py).

Run: python demos/hyperelasticity.py [N]
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

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_unit_cube,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.forms import deformation_gradient_3d
from dolfinx_materials_tpu.models import Ogden
from dolfinx_materials_tpu.solvers import solve_adaptive
from dolfinx_materials_tpu.utils.timers import list_timings, reset_timings


def main(N=4):
    # reference parameter mapping (mfront_materials/Ogden.mfront:8-12):
    # mu_phys = mu_ref * alpha / 2 = 0.4e6 Pa, alpha = 28.8, K = 1e9
    material = Material(Ogden(mu=(0.4e6,), alpha=(28.8,), K=1e9))

    mesh = create_unit_cube(N, N, N, "hexahedron")
    V = FunctionSpace(mesh, degree=1, shape=(3,))
    qmap = QuadratureMap(V, 2, material)
    qmap.register_gradient("F", deformation_gradient_3d())

    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 2], 0.0))
    top_z = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 2], 1.0), 2)
    bc_top = DirichletBC(top_z, 0.0)
    bcs = [DirichletBC(bottom, 0.0), bc_top]

    u = Function(V)
    problem = NonlinearMaterialProblem(
        qmap, u, bcs=bcs, options={"ksp_type": "lu", "rtol": 1e-8, "max_it": 25}
    )
    reset_timings()
    t0 = time.perf_counter()
    accepted = solve_adaptive(problem, lambda t: bc_top.set(-t), 0.2, nsteps0=8)
    wall = time.perf_counter() - t0
    print(f"gauss points: {qmap.num_points}, dofs: {V.num_dofs}")
    print(f"20% compression in {len(accepted)} steps, {wall:.1f}s")
    list_timings()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
