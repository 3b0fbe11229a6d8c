"""Staggered thermo-mechanical coupling: heat solve feeds the mechanical ESV.

Validates the Stress x Temperature tangent block and the ESV plumbing end to end
against the classic clamped-bar thermal-stress closed form."""

import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_unit_square,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
from dolfinx_materials_tpu.models import ThermoElasticIsotropic

E, nu, alpha_th, T0 = 70e3, 0.3, 1e-5, 293.15


def test_clamped_plate_thermal_stress():
    """Fully clamped plate heated uniformly by dT: eps = 0 everywhere, so
    sig = -3 kappa alpha dT I exactly (plane-strain clamped in x,y; ezz = 0)."""
    dT = 100.0
    mesh = create_unit_square(3, 3, "quad")
    V = FunctionSpace(mesh, 1, (2,))
    mat = Material(ThermoElasticIsotropic(E, nu, alpha_th, T0))
    qmap = QuadratureMap(V, 2, mat)
    qmap.register_gradient("Strain", mandel_strain_2d())
    qmap.register_external_state_variable("Temperature", T0 + dT)

    allb = locate_dofs_geometrical(
        V,
        lambda x: np.isclose(x[:, 0], 0) | np.isclose(x[:, 0], 1)
        | np.isclose(x[:, 1], 0) | np.isclose(x[:, 1], 1),
    )
    u = Function(V)
    problem = NonlinearMaterialProblem(
        qmap, u, bcs=[DirichletBC(allb, 0.0)], options={"ksp_type": "lu"}
    )
    converged, it = problem.solve()
    assert converged and it <= 2  # linear problem

    lmbda = E * nu / (1 + nu) / (1 - 2 * nu)
    mu = E / 2 / (1 + nu)
    sig = np.asarray(mat.data_manager.s0["Stress"])
    # eps = 0: sig = -C : alpha dT I = -(3 lmbda + 2 mu) alpha dT on the diagonal
    s_expected = -(3 * lmbda + 2 * mu) * alpha_th * dT
    np.testing.assert_allclose(sig[:, :3], s_expected, rtol=1e-9)
    np.testing.assert_allclose(sig[:, 3:], 0.0, atol=1e-9 * abs(s_expected))
    np.testing.assert_allclose(u.x, 0.0, atol=1e-14)


def test_free_expansion_stress_free():
    """Traction-free plate, uniform heating with minimal supports: stress ~ 0 and
    u = alpha dT x (free expansion)."""
    dT = 50.0
    mesh = create_unit_square(2, 2, "quad")
    V = FunctionSpace(mesh, 1, (2,))
    mat = Material(ThermoElasticIsotropic(E, nu, alpha_th, T0))
    qmap = QuadratureMap(V, 2, mat)
    qmap.register_gradient("Strain", mandel_strain_2d())
    qmap.register_external_state_variable("Temperature", T0 + dT)

    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0), 0)
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0), 1)
    u = Function(V)
    problem = NonlinearMaterialProblem(
        qmap, u, bcs=[DirichletBC(left, 0.0), DirichletBC(bottom, 0.0)],
        options={"ksp_type": "lu"},
    )
    converged, _ = problem.solve()
    assert converged
    sig = np.asarray(mat.data_manager.s0["Stress"])
    # plane strain: in-plane free expansion cannot relax sig_zz; in-plane
    # stresses are not exactly zero either (ezz = 0 constraint) — but the
    # in-plane displacement follows the constrained-expansion strain
    eps_star = (1 + nu) * alpha_th * dT  # plane-strain effective expansion
    coords = V.node_coords
    np.testing.assert_allclose(u.x[::2], eps_star * coords[:, 0], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(u.x[1::2], eps_star * coords[:, 1], rtol=1e-9, atol=1e-12)
    # in-plane stresses vanish (the (1+nu) effective expansion relaxes them)
    scale = E * alpha_th * dT
    np.testing.assert_allclose(sig[:, 0], 0.0, atol=1e-10 * scale)
    np.testing.assert_allclose(sig[:, 1], 0.0, atol=1e-10 * scale)
