"""Generalized-behavior FEM tests: stationary nonlinear heat transfer vs the
closed-form 1D solution, and transient phase change (theta-scheme) — the
reference's heat corpus (demos/mfront/heat_transfer/*) on the TPU-native stack."""

import jax.numpy as jnp
import numpy as np
import pytest

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_rectangle,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.forms import scalar_gradient, scalar_value
from dolfinx_materials_tpu.models import NonlinearHeatTransfer, PhaseChangeHeatTransfer


def test_stationary_nonlinear_heat_closed_form():
    """1D strip, T(0)=T0, T(L)=T1, k(T)=1/(A+B T): the exact solution satisfies
    A T + B T^2/2 linear in x; the constant flux is
    j = (1/(B L)) ln((A + B T0)/(A + B T1))  (reference demo validation,
    nonlinear_heat_transfer.py:330-345 checks k(T) pointwise)."""
    A, B = 0.0375, 2.165e-4
    T0, T1, L = 300.0, 800.0, 1.0
    mesh = create_rectangle((0, 0), (L, 0.1), (40, 2), "quad")
    V = FunctionSpace(mesh, 1, ())  # scalar space
    beh = NonlinearHeatTransfer(A=A, B=B, dim=2)
    mat = Material(beh)
    qmap = QuadratureMap(V, 2, mat)
    qmap.register_gradient("TemperatureGradient", scalar_gradient())
    qmap.register_external_state_variable("Temperature", scalar_value())

    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], L))
    bcs = [DirichletBC(left, T0), DirichletBC(right, T1)]

    T = Function(V)
    T.x[:] = T0  # initial guess
    problem = NonlinearMaterialProblem(
        qmap,
        T,
        bcs=bcs,
        residual_terms=[[("HeatFlux", scalar_gradient())]],
        options={"ksp_type": "lu", "atol": 1e-8, "rtol": 1e-10},
    )
    converged, niter = problem.solve()
    assert converged and niter < 10  # weakly nonlinear (reference asserts < 10)

    # flux at every Gauss point equals the closed-form constant flux
    j = np.asarray(mat.data_manager.s0["HeatFlux"])
    j_exact = np.log((A + B * T1) / (A + B * T0)) / (B * L)
    # P1 Gauss-point fluxes oscillate around the exact constant; the mean is
    # high-order accurate
    np.testing.assert_allclose(-j[:, 0], j_exact, rtol=1e-2)
    np.testing.assert_allclose(-j[:, 0].mean(), j_exact, rtol=2e-4)
    np.testing.assert_allclose(j[:, 1], 0.0, atol=1e-8 * abs(j_exact))

    # Kirchhoff potential phi(T) = (1/B) ln(A + B T) is linear in x
    coords = V.node_coords
    phi = np.log(A + B * T.x) / B
    p0 = np.log(A + B * T0) / B
    p1 = np.log(A + B * T1) / B
    np.testing.assert_allclose(
        phi, p0 + (p1 - p0) * coords[:, 0], rtol=5e-4, atol=1e-2
    )


def make_transient_phase_change(nx=60, Tsmooth=5.0, pure_conduction=False):
    beh = PhaseChangeHeatTransfer(Tsmooth=Tsmooth, dim=2)
    if pure_conduction:
        beh.kl, beh.cl, beh.dh_sl = beh.ks, beh.cs, 0.0
    L = 0.1
    mesh = create_rectangle((0, 0), (L, L / nx), (nx, 1), "quad")
    V = FunctionSpace(mesh, 1, ())
    mat = Material(beh)
    qmap = QuadratureMap(V, 2, mat)
    qmap.register_gradient("TemperatureGradient", scalar_gradient())
    qmap.register_external_state_variable("Temperature", scalar_value())
    return beh, mesh, V, mat, qmap, L


def test_transient_conduction_analytic():
    """theta=1 scheme on pure conduction vs the 1D series solution."""
    beh, mesh, V, mat, qmap, L = make_transient_phase_change(
        nx=50, pure_conduction=True
    )
    kappa = beh.ks / beh.cs
    T_init, T_bc = 1000.0, 700.0

    T = Function(V)
    T.x[:] = T_init
    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0.0))
    bcs = [DirichletBC(left, T_bc)]

    dt = {"v": 0.5}
    h_old = {"v": None}
    terms = [
        [
            ("Enthalpy", scalar_value()),
            ("HeatFlux", scalar_gradient(), lambda: -dt["v"]),
        ]
    ]
    problem = NonlinearMaterialProblem(
        qmap,
        T,
        bcs=bcs,
        residual_terms=terms,
        options={"ksp_type": "lu", "atol": 1e-3, "rtol": 1e-10},
    )
    # initialize state so Enthalpy(T_init) is committed (reference
    # phase_change.py:291-298 calls qmap.update() once first)
    qmap.update(jnp.asarray(T.x))
    qmap.advance()

    dom = qmap.domain
    ext = dom.make_residual([scalar_value()])

    t_end, nsteps = 10.0, 20
    dt["v"] = t_end / nsteps
    for _ in range(nsteps):
        h_old["v"] = mat.data_manager.s0["Enthalpy"]
        problem.external_force = np.asarray(ext(jnp.asarray(T.x), [h_old["v"]]))
        converged, _ = problem.solve()
        assert converged

    # analytic series solution of the semi-infinite/finite slab with insulated
    # right end: T(x,t) = T_bc + (T_init-T_bc) * sum_n (4/pi/(2n+1))
    #            sin((2n+1) pi x / (2L)) exp(-kappa ((2n+1) pi/(2L))^2 t)
    x = V.node_coords[:, 0]
    Ts = np.zeros_like(x)
    for n in range(200):
        lam = (2 * n + 1) * np.pi / (2 * L)
        Ts += (
            4 / np.pi / (2 * n + 1)
            * np.sin(lam * x)
            * np.exp(-kappa * lam**2 * t_end)
        )
    T_exact = T_bc + (T_init - T_bc) * Ts
    np.testing.assert_allclose(T.x, T_exact, rtol=2e-2, atol=2.0)


def test_phase_change_melting_front():
    """Qualitative Stefan check: heated boundary above T_m melts a front that
    advances monotonically; temperature gradient steepens across the front and
    enthalpy jumps by ~dh_sl there."""
    beh, mesh, V, mat, qmap, L = make_transient_phase_change(nx=60, Tsmooth=5.0)
    T_init = beh.Tm - 50.0
    T_hot = beh.Tm + 150.0

    T = Function(V)
    T.x[:] = T_init
    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0.0))
    bcs = [DirichletBC(left, T_hot)]
    dtv = 2.0
    terms = [
        [
            ("Enthalpy", scalar_value()),
            ("HeatFlux", scalar_gradient(), lambda: -dtv),
        ]
    ]
    problem = NonlinearMaterialProblem(
        qmap,
        T,
        bcs=bcs,
        residual_terms=terms,
        options={"ksp_type": "lu", "atol": 1e-2, "rtol": 1e-10, "max_it": 50},
    )
    qmap.update(jnp.asarray(T.x))
    qmap.advance()

    dom = qmap.domain
    ext = dom.make_residual([scalar_value()])
    fronts = []
    for step in range(12):
        problem.external_force = np.asarray(
            ext(jnp.asarray(T.x), [mat.data_manager.s0["Enthalpy"]])
        )
        converged, _ = problem.solve()
        assert converged
        x = V.node_coords[:, 0]
        molten = T.x > beh.Tm
        fronts.append(x[molten].max() if molten.any() else 0.0)

    fronts = np.array(fronts)
    assert fronts[-1] > fronts[0] > 0.0
    assert (np.diff(fronts) >= -1e-12).all(), "front must advance monotonically"
    # enthalpy jump across the front ~ dh_sl + sensible part
    h = np.asarray(mat.data_manager.s0["Enthalpy"]).ravel()
    Tq = np.asarray(mat.data_manager.s0["Temperature"]) if "Temperature" in mat.data_manager.s0.keys() else None
    assert h.max() - h.min() > beh.dh_sl
