"""Surface tractions, body forces, L2 projection, VTK output — the external-
loading and postprocessing surface of the reference demos (surface loads in
demos, utils.project at utils.py:19-68, XDMF writers)."""

import os

import numpy as np
import pytest

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_unit_cube,
    create_unit_square,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.facets import (
    assemble_body_force,
    assemble_traction,
    boundary_facets,
)
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
from dolfinx_materials_tpu.fem.io import write_vtk
from dolfinx_materials_tpu.models import LinearElasticIsotropic

E, nu = 70e3, 0.3


def test_boundary_facet_extraction():
    mesh = create_unit_square(3, 3, "quad")
    fverts, cells = boundary_facets(mesh)
    assert len(fverts) == 12  # 3 per side
    mesh3 = create_unit_cube(2, 2, 2, "hexahedron")
    f3, _ = boundary_facets(mesh3)
    assert len(f3) == 24  # 4 per face * 6 faces


@pytest.mark.parametrize("order", [1, 2])
def test_traction_patch(order):
    """Uniaxial-stress patch: traction t on the right edge -> homogeneous
    sig_xx = t everywhere (machine precision for an affine exact solution)."""
    t = 10.0
    mesh = create_unit_square(3, 2, "quad")
    V = FunctionSpace(mesh, order, (2,))
    mat = Material(LinearElasticIsotropic(E, nu))
    qmap = QuadratureMap(V, 2 * order, mat)
    qmap.register_gradient("Strain", mandel_strain_2d())

    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0), 0)
    bot = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0), 1)
    bcs = [DirichletBC(left, 0.0), DirichletBC(bot, 0.0)]

    F = assemble_traction(V, lambda x: np.isclose(x[:, 0], 1.0), np.array([t, 0.0]))
    # total force = t * edge length
    assert np.isclose(F.sum(), t * 1.0)

    u = Function(V)
    prob = NonlinearMaterialProblem(
        qmap, u, bcs=bcs, external_force=F, options={"ksp_type": "lu"}
    )
    converged, _ = prob.solve()
    assert converged
    sig = np.asarray(mat.data_manager.s0["Stress"])
    np.testing.assert_allclose(sig[:, 0], t, rtol=1e-9)
    np.testing.assert_allclose(sig[:, 1], 0.0, atol=1e-9 * t)
    np.testing.assert_allclose(sig[:, 3], 0.0, atol=1e-9 * t)


def test_body_force_column():
    """Column under gravity: sig_yy(y) = rho g (1 - y) (exact for P2)."""
    rho_g = 5.0
    mesh = create_unit_square(2, 8, "quad")
    V = FunctionSpace(mesh, 2, (2,))
    mat = Material(LinearElasticIsotropic(E, nu))
    qmap = QuadratureMap(V, 4, mat)
    qmap.register_gradient("Strain", mandel_strain_2d())

    bot = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0), 1)
    # roller side walls: keep the state uniaxial in y
    sides = locate_dofs_geometrical(
        V, lambda x: np.isclose(x[:, 0], 0) | np.isclose(x[:, 0], 1.0), 0
    )
    bcs = [DirichletBC(bot, 0.0), DirichletBC(sides, 0.0)]
    F = assemble_body_force(V, np.array([0.0, -rho_g]), quad_degree=4)
    assert np.isclose(F.sum(), -rho_g)

    u = Function(V)
    prob = NonlinearMaterialProblem(
        qmap, u, bcs=bcs, external_force=F, options={"ksp_type": "lu"}
    )
    converged, _ = prob.solve()
    assert converged
    sig = np.asarray(mat.data_manager.s0["Stress"])
    y = np.asarray(qmap.domain.x_q).reshape(-1, 2)[:, 1]
    np.testing.assert_allclose(sig[:, 1], -rho_g * (1 - y), rtol=1e-8, atol=1e-10)


def test_project_cg_exact_for_linear_field():
    mesh = create_unit_square(4, 4, "triangle")
    V = FunctionSpace(mesh, 1, (2,))
    mat = Material(LinearElasticIsotropic(E, nu))
    qmap = QuadratureMap(V, 2, mat)
    x_q = np.asarray(qmap.domain.x_q).reshape(-1, 2)
    field = np.stack([2 * x_q[:, 0] + 1, -x_q[:, 1]], axis=1)
    from dolfinx_materials_tpu.fem.assembly import project_cg

    target, vals = project_cg(qmap.domain, field, degree=1)
    coords = target.node_coords
    np.testing.assert_allclose(vals[:, 0], 2 * coords[:, 0] + 1, rtol=1e-9)
    np.testing.assert_allclose(vals[:, 1], -coords[:, 1], atol=1e-9)


def test_vtk_writer(tmp_path):
    mesh = create_unit_square(3, 3, "quad")
    path = write_vtk(
        tmp_path / "out.vtk",
        mesh,
        point_data={"T": np.arange(mesh.num_vertices, dtype=float)},
        cell_data={"p": np.ones(mesh.num_cells)},
    )
    text = open(path).read()
    assert "POINTS 16 double" in text
    assert "CELL_TYPES 9" in text
    assert "SCALARS T double" in text
    assert "CELL_DATA 9" in text
