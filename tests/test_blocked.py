"""Monolithic blocked multi-field Newton (BlockedNonlinearProblem).

The reference assembles blocked multi-space problems through PETSc (reference
solvers.py:75-95). Here: a STIFFLY two-way-coupled thermo-mechanical problem —
thermal expansion drives the mechanics, volumetric strain injects heat — where
block Gauss-Seidel (solve_coupled) needs many outer iterations, while the
monolithic blocked Newton with cross-field tangent blocks converges at full
Newton rate and matches the (eventually) converged staggered answer.
"""

import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.solvers import BlockedNonlinearProblem, solve_coupled
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_rectangle,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.forms import (
    mandel_strain_2d,
    scalar_gradient,
    scalar_value,
)
from dolfinx_materials_tpu.models import ThermoElasticIsotropic
from dolfinx_materials_tpu.models.thermal import ThermoMechanicalHeat
import pytest

E, nu, T0 = 70e3, 0.3, 293.15
alpha_th = 1e-3  # strong expansion -> strong u <- T coupling
chi = 6e3  # strong heat source from dilatation -> strong T <- u coupling
kappa, k_cond = 1.0, 1.0


def vol_strain():
    def expr(ctx):
        g = ctx.grad
        return jnp.stack([g[0, 0] + g[1, 1]])

    return expr


def build(N=6, mesh=None):
    if mesh is None:
        mesh = create_rectangle((0, 0), (1.0, 1.0), (N, N), "quad")

    # --- thermal field ----------------------------------------------------
    VT = FunctionSpace(mesh, 1, ())
    mat_T = Material(ThermoMechanicalHeat(k=k_cond, kappa=kappa, chi=chi, T0=T0))
    qT = QuadratureMap(VT, 2, mat_T)
    qT.register_gradient("TemperatureGradient", scalar_gradient())
    qT.register_external_state_variable("Temperature", scalar_value())
    leftT = locate_dofs_geometrical(VT, lambda x: np.isclose(x[:, 0], 0.0))
    rightT = locate_dofs_geometrical(VT, lambda x: np.isclose(x[:, 0], 1.0))
    T = Function(VT)
    T.x[:] = T0
    heat = NonlinearMaterialProblem(
        qT,
        T,
        bcs=[DirichletBC(leftT, T0 + 50.0), DirichletBC(rightT, T0)],
        residual_terms=[
            [("HeatFlux", scalar_gradient(), -1.0), ("Source", scalar_value(), 1.0)]
        ],
        options={"ksp_type": "lu"},
    )

    # --- mechanical field ---------------------------------------------------
    Vu = FunctionSpace(mesh, 1, (2,))
    mat_u = Material(ThermoElasticIsotropic(E, nu, alpha_th, T0))
    qu = QuadratureMap(Vu, 2, mat_u)
    qu.register_gradient("Strain", mandel_strain_2d())
    qu.register_external_state_variable("Temperature", T0)
    clamped = locate_dofs_geometrical(
        Vu, lambda x: np.isclose(x[:, 0], 0.0) | np.isclose(x[:, 0], 1.0)
    )
    u = Function(Vu)
    mech = NonlinearMaterialProblem(
        qu, u, bcs=[DirichletBC(clamped, 0.0)], options={"ksp_type": "lu"}
    )

    return heat, mech, qT, qu, T, u, mat_u, mat_T


def couplings(heat, mech, qT, qu):
    return [
        # dStress/dTemperature: mechanics row, thermal col
        (1, 0, qu, "Stress", "Temperature", scalar_value()),
        # dSource/dVolStrain: thermal row, mechanical col
        (0, 1, qT, "Source", "VolStrain", vol_strain()),
    ]


@pytest.mark.slow
def test_blocked_beats_gauss_seidel_on_stiff_coupling():
    # 1) block Gauss-Seidel on the stiff problem: slow (needs many outers)
    heat, mech, qT, qu, T, u, mat_u, mat_T = build()

    def push_T():
        T_g = qT._eval_fns["Temperature"](jnp.asarray(T.x))
        qu.material.update_external_state_variable("Temperature", T_g)

    def push_ev():
        from dolfinx_materials_tpu.fem.assembly import QuadratureDomain

        dom = qu.domain
        ev = dom.make_eval(vol_strain())(jnp.asarray(u.x))
        qT.material.update_external_state_variable("VolStrain", ev)

    ok_gs_12, n12 = solve_coupled(
        [heat, mech], [push_ev, push_T], max_outer=10, rtol=1e-10
    )
    assert not ok_gs_12 or n12 > 10, (
        f"coupling not stiff enough: GS converged in {n12} outers"
    )

    # 2) monolithic blocked Newton on a FRESH build: full Newton rate
    heat2, mech2, qT2, qu2, T2, u2, mat_u2, mat_T2 = build()
    blocked = BlockedNonlinearProblem(
        [heat2, mech2],
        couplings(heat2, mech2, qT2, qu2),
        options={"ksp_type": "lu"},
    )
    ok, its = blocked.solve()
    assert ok
    assert its <= 5, f"monolithic Newton took {its} iterations"
    assert np.abs(u2.x).max() > 1e-5  # mechanics actually moved
    assert np.abs(T2.x - T0).max() > 1.0

    # 3) staggered WITH enough outers eventually converges to the same answer
    heat3, mech3, qT3, qu3, T3, u3, mat_u3, mat_T3 = build()

    def push_T3():
        T_g = qT3._eval_fns["Temperature"](jnp.asarray(T3.x))
        qu3.material.update_external_state_variable("Temperature", T_g)

    def push_ev3():
        ev = qu3.domain.make_eval(vol_strain())(jnp.asarray(u3.x))
        qT3.material.update_external_state_variable("VolStrain", ev)

    ok_gs, n_gs = solve_coupled(
        [heat3, mech3], [push_ev3, push_T3], max_outer=400, rtol=1e-12
    )
    assert ok_gs, "staggered reference failed even with 400 outers"
    assert n_gs > 10, f"GS converged too fast ({n_gs}) — coupling not stiff"
    np.testing.assert_allclose(u3.x, u2.x, rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(T3.x, T2.x, rtol=1e-8)


def test_blocked_matches_single_field_when_uncoupled():
    """chi = 0, alpha = 0: the blocked solve must reduce exactly to the two
    independent single-field solves."""
    mesh = create_rectangle((0, 0), (1.0, 1.0), (5, 5), "quad")
    VT = FunctionSpace(mesh, 1, ())
    mat_T = Material(ThermoMechanicalHeat(k=2.0, kappa=0.5, chi=0.0, T0=T0))
    qT = QuadratureMap(VT, 2, mat_T)
    qT.register_gradient("TemperatureGradient", scalar_gradient())
    qT.register_external_state_variable("Temperature", scalar_value())
    leftT = locate_dofs_geometrical(VT, lambda x: np.isclose(x[:, 0], 0.0))
    rightT = locate_dofs_geometrical(VT, lambda x: np.isclose(x[:, 0], 1.0))
    T = Function(VT)
    T.x[:] = T0
    terms = [
        [("HeatFlux", scalar_gradient(), -1.0), ("Source", scalar_value(), 1.0)]
    ]
    bcsT = [DirichletBC(leftT, T0 + 50.0), DirichletBC(rightT, T0)]
    heat = NonlinearMaterialProblem(
        qT, T, bcs=bcsT, residual_terms=terms, options={"ksp_type": "lu"}
    )

    Vu = FunctionSpace(mesh, 1, (2,))
    mat_u = Material(ThermoElasticIsotropic(E, nu, 0.0, T0))
    qu = QuadratureMap(Vu, 2, mat_u)
    qu.register_gradient("Strain", mandel_strain_2d())
    qu.register_external_state_variable("Temperature", T0)
    left = locate_dofs_geometrical(Vu, lambda x: np.isclose(x[:, 0], 0), 0)
    bot = locate_dofs_geometrical(Vu, lambda x: np.isclose(x[:, 1], 0), 1)
    right = locate_dofs_geometrical(Vu, lambda x: np.isclose(x[:, 0], 1), 0)
    u = Function(Vu)
    bcsu = [DirichletBC(left, 0.0), DirichletBC(bot, 0.0), DirichletBC(right, 1e-3)]
    mech = NonlinearMaterialProblem(qu, u, bcs=bcsu, options={"ksp_type": "lu"})

    blocked = BlockedNonlinearProblem(
        [heat, mech],
        [(1, 0, qu, "Stress", "Temperature", scalar_value())],
        options={"ksp_type": "lu"},
    )
    ok, _ = blocked.solve()
    assert ok
    T_b, u_b = T.x.copy(), u.x.copy()

    # independent single-field solves
    T.x[:] = T0
    u.x[:] = 0.0
    heat2 = NonlinearMaterialProblem(
        qT, T, bcs=bcsT, residual_terms=terms, options={"ksp_type": "lu"}
    )
    ok1, _ = heat2.solve()
    mech2 = NonlinearMaterialProblem(qu, u, bcs=bcsu, options={"ksp_type": "lu"})
    ok2, _ = mech2.solve()
    assert ok1 and ok2
    np.testing.assert_allclose(T_b, T.x, rtol=1e-9)
    np.testing.assert_allclose(u_b, u.x, rtol=1e-9, atol=1e-15)
