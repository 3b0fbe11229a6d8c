"""Nonlinear heat transfer + transient phase change (generalized behaviors).

TPU-native rebuild of the reference heat corpus (demos/mfront/heat_transfer/
nonlinear_heat_transfer.py and phase_change.py): stationary conduction with
k(T) = 1/(A+B T) validated against the Kirchhoff-transform closed form, then a
1D Stefan-type melting problem with the enthalpy ISV in a theta-scheme residual.

Run: python demos/heat_transfer.py
"""

import sys

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
    create_rectangle,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.forms import scalar_gradient, scalar_value
from dolfinx_materials_tpu.fem.io import write_vtk
from dolfinx_materials_tpu.models import NonlinearHeatTransfer, PhaseChangeHeatTransfer


def stationary(nx=40):
    A, B = 0.0375, 2.165e-4
    T0, T1 = 300.0, 800.0
    mesh = create_rectangle((0, 0), (1.0, 0.2), (nx, max(2, nx // 10)), "quad")
    V = FunctionSpace(mesh, 1, ())
    mat = Material(NonlinearHeatTransfer(A=A, B=B, dim=2))
    qmap = QuadratureMap(V, 2, mat)
    qmap.register_gradient("TemperatureGradient", scalar_gradient())
    qmap.register_external_state_variable("Temperature", scalar_value())

    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1.0))
    T = Function(V)
    T.x[:] = T0
    problem = NonlinearMaterialProblem(
        qmap,
        T,
        bcs=[DirichletBC(left, T0), DirichletBC(right, T1)],
        residual_terms=[[("HeatFlux", scalar_gradient())]],
        options={"ksp_type": "lu", "atol": 1e-8},
    )
    converged, it = problem.solve()
    assert converged and it < 10
    j = np.asarray(mat.data_manager.s0["HeatFlux"])
    j_exact = np.log((A + B * T1) / (A + B * T0)) / B
    print(f"stationary: {it} Newton its, flux error "
          f"{abs(-j[:, 0].mean() - j_exact) / j_exact:.2e}")


def phase_change(nx=60, nsteps=15):
    beh = PhaseChangeHeatTransfer(Tsmooth=5.0, dim=2)
    L = 0.1
    mesh = create_rectangle((0, 0), (L, L / nx), (nx, 1), "quad")
    V = FunctionSpace(mesh, 1, ())
    mat = Material(beh)
    qmap = QuadratureMap(V, 2, mat)
    qmap.register_gradient("TemperatureGradient", scalar_gradient())
    qmap.register_external_state_variable("Temperature", scalar_value())

    T = Function(V)
    T.x[:] = beh.Tm - 50.0
    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0.0))
    bcs = [DirichletBC(left, beh.Tm + 150.0)]
    dtv = 2.0
    problem = NonlinearMaterialProblem(
        qmap,
        T,
        bcs=bcs,
        residual_terms=[
            [("Enthalpy", scalar_value()), ("HeatFlux", scalar_gradient(), lambda: -dtv)]
        ],
        options={"ksp_type": "lu", "atol": 1e-2, "max_it": 50},
    )
    qmap.update(jnp.asarray(T.x))
    qmap.advance()
    ext = qmap.domain.make_residual([scalar_value()])
    from dolfinx_materials_tpu.fem.io import TimeSeriesWriter

    series = TimeSeriesWriter("phase_change", mesh)
    series.write(0.0, point_data={"T": T.x})
    fronts = []
    for step in range(nsteps):
        problem.external_force = np.asarray(
            ext(jnp.asarray(T.x), [mat.data_manager.s0["Enthalpy"]])
        )
        converged, _ = problem.solve()
        assert converged
        x = V.node_coords[:, 0]
        molten = T.x > beh.Tm
        fronts.append(x[molten].max() if molten.any() else 0.0)
        # transient time series: per-step snapshot + .pvd index (the
        # reference's XDMF time-series role, phase_change.py:296-393)
        series.write((step + 1) * dtv, point_data={"T": T.x})
    write_vtk("phase_change.vtk", mesh, point_data={"T": T.x})
    print(f"phase change: melting front at t={nsteps * dtv:.0f}s: {fronts[-1]:.4f} m "
          f"(monotone: {bool((np.diff(fronts) >= 0).all())})")


if __name__ == "__main__":
    stationary()
    phase_change()
