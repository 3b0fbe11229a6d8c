"""Shared uniaxial-tension FEM harness — rebuild of the reference's
tests/uniaxial_tension.py:11-118 on the TPU-native FEM layer.

2D unit square (quads or triangles), plane-strain Mandel strain, QuadratureMap +
Newton solve, Dirichlet BCs: left u_x = 0, bottom u_y = 0, right u_x = Exx step.
Returns the stress history at the first Gauss point.
"""

import numpy as np

from dolfinx_materials_tpu import NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_unit_square,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d


def uniaxial_tension_2D(
    material, Exx, N=1, order=1, cell_type="quad", ksp_type="lu", angle=None, dt=0.0
):
    mesh = create_unit_square(N, N, cell_type)
    V = FunctionSpace(mesh, degree=order, shape=(2,))
    # NOTE: the reference uses deg_quad = 2*(order-1) (tests/uniaxial_tension.py:15)
    # which is 1-point quadrature on Q1 quads -> hourglass modes; we use full
    # integration (2*order) so the tangent is honestly nonsingular.
    deg_quad = 2 * order

    left_x = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0.0), component=0)
    bottom_y = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0.0), component=1)
    right_x = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1.0), component=0)

    bc_right = DirichletBC(right_x, 0.0)
    bcs = [DirichletBC(left_x, 0.0), DirichletBC(bottom_y, 0.0), bc_right]

    u = Function(V, name="u")
    qmap = QuadratureMap(V, deg_quad, material)
    qmap.dt = dt
    qmap.register_gradient(material.gradient_names[0], mandel_strain_2d())
    if angle is not None:
        import jax.numpy as jnp

        c, s = np.cos(angle), np.sin(angle)
        material.rotation_matrix = jnp.asarray(
            [[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]]
        )

    problem = NonlinearMaterialProblem(
        qmap, u, bcs=bcs, options={"ksp_type": ksp_type, "atol": 1e-10, "rtol": 1e-10}
    )

    Stress = np.zeros((len(Exx), 6))
    for i, exx in enumerate(Exx[1:]):
        bc_right.set(exx)
        converged, it = problem.solve()
        assert converged, f"Newton failed at step {i + 1}"
        flux0 = np.asarray(qmap.material.data_manager.s0[material.flux_names[0]])
        Stress[i + 1, :] = flux0[0]
    return Stress, u, qmap
