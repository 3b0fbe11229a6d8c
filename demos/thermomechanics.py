"""Staggered thermo-mechanical coupling: nonlinear heat conduction drives
thermal stresses in a clamped plate.

Multi-physics composition of the framework's pieces: the SAME mesh/quadrature
hosts two QuadratureMaps (NonlinearHeatTransfer on a scalar space,
ThermoElasticIsotropic on a vector space); the converged Gauss-point temperature
field is handed to the mechanical material as an external state variable —
no projection needed because the Gauss points coincide.

Run: python demos/thermomechanics.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_rectangle,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d, scalar_gradient, scalar_value
from dolfinx_materials_tpu.fem.io import write_vtk
from dolfinx_materials_tpu.models import NonlinearHeatTransfer, ThermoElasticIsotropic


def main(N=16):
    E, nu, alpha_th, T0 = 70e3, 0.3, 1e-5, 293.15
    T_hot = T0 + 400.0
    mesh = create_rectangle((0, 0), (2.0, 1.0), (2 * N, N), "quad")

    # --- thermal problem (scalar space) ---------------------------------
    VT = FunctionSpace(mesh, 1, ())
    mat_T = Material(NonlinearHeatTransfer(A=0.0375, B=2.165e-4, dim=2))
    qmap_T = QuadratureMap(VT, 2, mat_T)
    qmap_T.register_gradient("TemperatureGradient", scalar_gradient())
    qmap_T.register_external_state_variable("Temperature", scalar_value())
    left = locate_dofs_geometrical(VT, lambda x: np.isclose(x[:, 0], 0.0))
    right = locate_dofs_geometrical(VT, lambda x: np.isclose(x[:, 0], 2.0))
    T = Function(VT)
    T.x[:] = T0
    heat = NonlinearMaterialProblem(
        qmap_T,
        T,
        bcs=[DirichletBC(left, T_hot), DirichletBC(right, T0)],
        residual_terms=[[("HeatFlux", scalar_gradient())]],
        options={"ksp_type": "lu", "atol": 1e-8},
    )
    converged, it_T = heat.solve()
    assert converged

    # --- mechanical problem (vector space), fed by the Gauss-point T ----
    Vu = FunctionSpace(mesh, 1, (2,))
    mat_u = Material(ThermoElasticIsotropic(E, nu, alpha_th, T0))
    qmap_u = QuadratureMap(Vu, 2, mat_u)
    qmap_u.register_gradient("Strain", mandel_strain_2d())
    # same mesh + quadrature degree -> Gauss points coincide: hand the field over
    T_gauss = qmap_T._eval_fns["Temperature"](jnp.asarray(T.x))
    qmap_u.register_external_state_variable("Temperature", np.asarray(T_gauss))

    clamped = locate_dofs_geometrical(
        Vu, lambda x: np.isclose(x[:, 0], 0.0) | np.isclose(x[:, 0], 2.0)
    )
    u = Function(Vu)
    mech = NonlinearMaterialProblem(
        qmap_u, u, bcs=[DirichletBC(clamped, 0.0)], options={"ksp_type": "lu"}
    )
    converged, it_u = mech.solve()
    assert converged

    sig = np.asarray(mat_u.data_manager.s0["Stress"])
    target, vals = qmap_u.project_on("Stress", ("P", 1))
    write_vtk(
        "thermomechanics.vtk",
        mesh,
        point_data={"T": T.x, "sxx": vals[:, 0], "u": u.x.reshape(-1, 2)},
    )
    print(f"thermal solve: {it_T} its; mechanical solve: {it_u} its")
    print(
        f"max |T| = {T.x.max():.1f} K, min sig_xx = {sig[:, 0].min():.1f} "
        f"(compressive near the hot edge), wrote thermomechanics.vtk"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
