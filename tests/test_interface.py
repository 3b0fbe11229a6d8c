"""Interface-law multi-material problems (submeshes + elastic interface).

Rebuild of the reference's multimaterials composition (reference
demos/multimaterials/multimaterials.py:242-353): two displacement fields on
facing submeshes with duplicated interface dofs, joined by t = K [[u]].

Closed-form check: a two-layer sandwich strip in uniaxial tension (nu = 0) is a
series arrangement of two bars and an interface spring:

    u(L) = s (L1/E1 + L2/E2 + 1/K),   [[u]]_x = s / K,   sig_xx = s everywhere.

Stiff-K limit check: K -> large reproduces the single-field two-material solve
on the parent mesh (the reference's test_multimaterials equivalence pattern).
"""

import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.solvers import BlockedNonlinearProblem
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_rectangle,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.facets import assemble_traction
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
from dolfinx_materials_tpu.fem.submesh import (
    InterfaceDomain,
    InterfaceTerm,
    elastic_interface,
    extract_submesh,
    interface_facets,
)
from dolfinx_materials_tpu.models import LinearElasticIsotropic

E1, E2, s_load = 50e3, 200e3, 10.0


def build_two_field(K, N=(10, 2)):
    parent = create_rectangle((0, 0), (1.0, 0.2), N, "quad")
    centers = parent.cell_centers()
    cells1 = np.nonzero(centers[:, 0] < 0.5)[0].astype(np.int32)
    cells2 = np.nonzero(centers[:, 0] > 0.5)[0].astype(np.int32)

    m1, vmap1 = extract_submesh(parent, cells1)
    m2, vmap2 = extract_submesh(parent, cells2)
    V1 = FunctionSpace(m1, 1, (2,))
    V2 = FunctionSpace(m2, 1, (2,))

    def mech(V, E):
        mat = Material(LinearElasticIsotropic(E, 0.0))
        q = QuadratureMap(V, 2, mat)
        q.register_gradient("Strain", mandel_strain_2d())
        return mat, q

    mat_a, q1 = mech(V1, E1)
    mat_b, q2 = mech(V2, E2)

    left = locate_dofs_geometrical(V1, lambda x: np.isclose(x[:, 0], 0.0), 0)
    bot1 = locate_dofs_geometrical(V1, lambda x: np.isclose(x[:, 1], 0.0), 1)
    bot2 = locate_dofs_geometrical(V2, lambda x: np.isclose(x[:, 1], 0.0), 1)
    F2 = assemble_traction(V2, lambda x: np.isclose(x[:, 0], 1.0), np.array([s_load, 0.0]))

    u1, u2 = Function(V1), Function(V2)
    p1 = NonlinearMaterialProblem(
        q1, u1, bcs=[DirichletBC(left, 0.0), DirichletBC(bot1, 0.0)],
        options={"ksp_type": "lu"},
    )
    p2 = NonlinearMaterialProblem(
        q2, u2, bcs=[DirichletBC(bot2, 0.0)], external_force=F2,
        options={"ksp_type": "lu"},
    )

    fvp = interface_facets(parent, cells1, cells2)
    assert len(fvp) == N[1]
    dom = InterfaceDomain(V1, V2, fvp, vmap1, vmap2)
    itf = InterfaceTerm(0, 1, dom, elastic_interface(K))

    blocked = BlockedNonlinearProblem(
        [p1, p2], interfaces=[itf], options={"ksp_type": "lu"}
    )
    return blocked, u1, u2, mat_a, mat_b, dom, parent, cells1, cells2


def test_sandwich_closed_form():
    K = 2e4
    blocked, u1, u2, mat_a, mat_b, dom, *_ = build_two_field(K)
    ok, its = blocked.solve()
    assert ok

    # stresses uniform = s everywhere, both subdomains
    for mat in (mat_a, mat_b):
        sig = np.asarray(mat.data_manager.s0["Stress"])
        np.testing.assert_allclose(sig[:, 0], s_load, rtol=1e-6)
        np.testing.assert_allclose(sig[:, 1], 0.0, atol=1e-6 * s_load)

    # displacement jump = s / K across the whole interface
    j = np.asarray(dom.jump(jnp.asarray(u1.x), jnp.asarray(u2.x)))
    np.testing.assert_allclose(j[..., 0], s_load / K, rtol=1e-6)
    np.testing.assert_allclose(j[..., 1], 0.0, atol=1e-9)

    # end displacement = series compliance
    V2 = u2.space
    right = locate_dofs_geometrical(V2, lambda x: np.isclose(x[:, 0], 1.0), 0)
    u_end = u2.x[right]
    expected = s_load * (0.5 / E1 + 0.5 / E2 + 1.0 / K)
    np.testing.assert_allclose(u_end, expected, rtol=1e-6)


def test_stiff_interface_limit_matches_monolithic():
    """K -> large: the two-field interface solve converges to the single-field
    two-material solve on the parent mesh (cell-subset QuadratureMaps)."""
    K = 1e9
    blocked, u1, u2, *_, parent, cells1, cells2 = build_two_field(K)
    ok, _ = blocked.solve()
    assert ok

    # single-field reference on the parent mesh
    V = FunctionSpace(parent, 1, (2,))
    mats, qmaps = [], []
    for cells, E in ((cells1, E1), (cells2, E2)):
        mat = Material(LinearElasticIsotropic(E, 0.0))
        q = QuadratureMap(V, 2, mat, cells=cells)
        q.register_gradient("Strain", mandel_strain_2d())
        mats.append(mat)
        qmaps.append(q)
    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0.0), 0)
    bot = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0.0), 1)
    F = assemble_traction(V, lambda x: np.isclose(x[:, 0], 1.0), np.array([s_load, 0.0]))
    u = Function(V)
    mono = NonlinearMaterialProblem(
        qmaps, u, bcs=[DirichletBC(left, 0.0), DirichletBC(bot, 0.0)],
        external_force=F, options={"ksp_type": "lu"},
    )
    ok, _ = mono.solve()
    assert ok

    # compare at shared parent vertices (each submesh node maps to a parent
    # node); the residual interface compliance s/K is the physical floor
    floor = 2 * s_load / K + 1e-7 * np.abs(u.x).max()
    for ui, sub in ((u1, 0), (u2, 1)):
        vmap = extract_submesh(parent, (cells1, cells2)[sub])[1]
        ue = ui.x.reshape(-1, 2)
        up = u.x.reshape(-1, 2)[vmap]
        np.testing.assert_allclose(ue, up, atol=floor)


def test_plastic_multimaterial_with_interface():
    """The reference demo's actual pattern: plastic materials on both
    subdomains + elastic interface (multimaterials.py:242-330). Series
    equilibrium still forces sig_xx = s; subdomain 1 yields."""
    from dolfinx_materials_tpu.models import (
        LinearHardening,
        vonMisesIsotropicHardening,
    )

    K = 5e4
    parent = create_rectangle((0, 0), (1.0, 0.2), (10, 2), "quad")
    centers = parent.cell_centers()
    cells1 = np.nonzero(centers[:, 0] < 0.5)[0].astype(np.int32)
    cells2 = np.nonzero(centers[:, 0] > 0.5)[0].astype(np.int32)
    m1, vmap1 = extract_submesh(parent, cells1)
    m2, vmap2 = extract_submesh(parent, cells2)
    V1, V2 = FunctionSpace(m1, 1, (2,)), FunctionSpace(m2, 1, (2,))

    s_y = 8.0  # subdomain-1 yield below the applied load
    mat1 = Material(
        vonMisesIsotropicHardening(
            LinearElasticIsotropic(E1, 0.0), LinearHardening(s_y, E1 / 10)
        )
    )
    mat2 = Material(
        vonMisesIsotropicHardening(
            LinearElasticIsotropic(E2, 0.0), LinearHardening(100.0, E2 / 10)
        )
    )
    q1 = QuadratureMap(V1, 2, mat1)
    q1.register_gradient("Strain", mandel_strain_2d())
    q2 = QuadratureMap(V2, 2, mat2)
    q2.register_gradient("Strain", mandel_strain_2d())

    left = locate_dofs_geometrical(V1, lambda x: np.isclose(x[:, 0], 0.0), 0)
    bot1 = locate_dofs_geometrical(V1, lambda x: np.isclose(x[:, 1], 0.0), 1)
    bot2 = locate_dofs_geometrical(V2, lambda x: np.isclose(x[:, 1], 0.0), 1)
    F2 = assemble_traction(V2, lambda x: np.isclose(x[:, 0], 1.0), np.array([s_load, 0.0]))
    u1, u2 = Function(V1), Function(V2)
    p1 = NonlinearMaterialProblem(
        q1, u1, bcs=[DirichletBC(left, 0.0), DirichletBC(bot1, 0.0)],
        options={"ksp_type": "lu"},
    )
    p2 = NonlinearMaterialProblem(
        q2, u2, bcs=[DirichletBC(bot2, 0.0)], external_force=F2,
        options={"ksp_type": "lu"},
    )
    fvp = interface_facets(parent, cells1, cells2)
    dom = InterfaceDomain(V1, V2, fvp, vmap1, vmap2)
    blocked = BlockedNonlinearProblem(
        [p1, p2], interfaces=[InterfaceTerm(0, 1, dom, elastic_interface(K))],
        options={"ksp_type": "lu"},
    )
    ok, its = blocked.solve()
    assert ok
    # J2 flow is incompressible, so the plastic strip develops mild lateral
    # constraint effects: sig_xx is uniform only to a few % (exact in the mean)
    sig1 = np.asarray(mat1.data_manager.s0["Stress"])
    sig2 = np.asarray(mat2.data_manager.s0["Stress"])
    np.testing.assert_allclose(sig1[:, 0], s_load, rtol=5e-2)
    np.testing.assert_allclose(sig2[:, 0], s_load, rtol=5e-2)
    p_acc = np.asarray(mat1.data_manager.s0["p"])
    assert p_acc.min() > 1e-4, "subdomain 1 must have yielded"
    assert np.asarray(mat2.data_manager.s0["p"]).max() < 1e-12
    # jump law holds pointwise against the local interface traction
    j = np.asarray(dom.jump(jnp.asarray(u1.x), jnp.asarray(u2.x)))
    np.testing.assert_allclose(j[..., 0], s_load / K, rtol=5e-2)
    np.testing.assert_allclose(j[..., 0].mean(), s_load / K, rtol=2e-3)
