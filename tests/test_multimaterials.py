"""Multi-material (cell-subset QuadratureMap) tests — rebuild of the reference's
tests/mfront/test_multimaterials.py:111-172: two subset maps must reproduce the
single-map solution exactly and have disjoint supports."""

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
from dolfinx_materials_tpu.models import (
    LinearElasticIsotropic,
    LinearHardening,
    vonMisesIsotropicHardening,
)

E, nu, sig0 = 70e3, 0.3, 350.0


def make_mat():
    return Material(
        vonMisesIsotropicHardening(
            LinearElasticIsotropic(E, nu), LinearHardening(sig0, 1000.0)
        )
    )


def solve_problem(qmaps, V, exx):
    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0), 0)
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0), 1)
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1), 0)
    bcs = [DirichletBC(left, 0.0), DirichletBC(bottom, 0.0), DirichletBC(right, exx)]
    u = Function(V)
    problem = NonlinearMaterialProblem(
        qmaps, u, bcs=bcs, options={"ksp_type": "lu"}
    )
    converged, _ = problem.solve()
    assert converged
    return u


def test_split_equals_mono():
    mesh = create_unit_square(4, 4, "quad")
    V = FunctionSpace(mesh, 1, (2,))
    exx = 3 * sig0 / E

    # mono-material reference
    mat0 = make_mat()
    qmap0 = QuadratureMap(V, 2, mat0)
    qmap0.register_gradient("Strain", mandel_strain_2d())
    u0 = solve_problem(qmap0, V, exx)

    # split: even / odd cells (disjoint, covering)
    cells = np.arange(mesh.num_cells)
    subsets = [cells[cells % 2 == 0], cells[cells % 2 == 1]]
    assert len(np.intersect1d(*subsets)) == 0
    assert sum(len(s) for s in subsets) == mesh.num_cells

    qmaps = []
    mats = []
    for sub in subsets:
        m = make_mat()
        q = QuadratureMap(V, 2, m, cells=sub)
        q.register_gradient("Strain", mandel_strain_2d())
        qmaps.append(q)
        mats.append(m)
    u1 = solve_problem(qmaps, V, exx)

    np.testing.assert_allclose(u1.x, u0.x, rtol=1e-9, atol=1e-13)

    # plastic state developed and matches the mono solve on each subset
    p0 = np.asarray(mat0.data_manager.s0["p"]).ravel()
    nq = qmap0.domain.nq
    assert p0.max() > 1e-4
    for sub, m in zip(subsets, mats):
        p_sub = np.asarray(m.data_manager.s0["p"]).ravel()
        idx = (sub[:, None] * nq + np.arange(nq)[None, :]).ravel()
        np.testing.assert_allclose(p_sub, p0[idx], rtol=1e-8, atol=1e-14)


def test_heterogeneous_materials():
    """Different stiffness per half: compliance is between the two bounds."""
    mesh = create_unit_square(4, 4, "quad")
    V = FunctionSpace(mesh, 1, (2,))
    centers = mesh.cell_centers()
    left_cells = np.nonzero(centers[:, 0] < 0.5)[0]
    right_cells = np.nonzero(centers[:, 0] >= 0.5)[0]

    m_soft = Material(LinearElasticIsotropic(E / 10, nu))
    m_hard = Material(LinearElasticIsotropic(E, nu))
    q1 = QuadratureMap(V, 2, m_soft, cells=left_cells)
    q2 = QuadratureMap(V, 2, m_hard, cells=right_cells)
    for q in (q1, q2):
        q.register_gradient("Strain", mandel_strain_2d())
    exx = 1e-3
    u = solve_problem([q1, q2], V, exx)
    # series springs: soft half stretches ~10x more than hard half (1D estimate
    # 10/11 exx, loosened for plane-strain 2D interface effects)
    mid_x = u.x[::2][np.isclose(V.node_coords[:, 0], 0.5)]
    expected_mid = exx * (10.0 / 11.0)
    np.testing.assert_allclose(mid_x.mean(), expected_mid, rtol=5e-2)
    assert mid_x.mean() > 0.75 * exx
