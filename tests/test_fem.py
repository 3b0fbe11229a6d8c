"""FEM layer tests: elements/quadrature sanity, elastic patch tests, and the
J2 plasticity uniaxial-tension analytic check (the reference's
tests/mfront/test_elastoplasticity.py:14-36 rebuilt on the TPU-native stack)."""

import numpy as np
import pytest

from dolfinx_materials_tpu.fem import FunctionSpace, create_unit_square, create_unit_cube
from dolfinx_materials_tpu.fem.assembly import QuadratureDomain, assemble_scalar
from dolfinx_materials_tpu.fem.element import ReferenceElement, quadrature_rule
from dolfinx_materials_tpu.models import (
    LinearElasticIsotropic,
    LinearHardening,
    vonMisesIsotropicHardening,
)
from dolfinx_materials_tpu.ops import tensors as tn
from uniaxial_tension import uniaxial_tension_2D

E, nu = 70e3, 0.3
sig0 = 500.0


@pytest.mark.parametrize("deg", [1, 2, 3, 4, 5, 6])
@pytest.mark.parametrize("cell", ["triangle", "quad", "tetrahedron", "hexahedron"])
def test_quadrature_exactness(cell, deg):
    """Every rule (symmetric Dunavant/Keast on simplices, tensor/Duffy
    otherwise) integrates all monomials of its stated degree exactly; the
    numeric check is the guard on the hand-entered simplex tables."""
    pts, wts = quadrature_rule(cell, deg)
    assert (wts > 0).all(), "positive weights expected from every rule"
    dim = pts.shape[1]
    # integrate monomials of total degree <= deg over the reference cell
    rng = np.random.default_rng(0)
    from itertools import product

    for powers in product(range(deg + 1), repeat=dim):
        if sum(powers) > deg:
            continue
        val = np.sum(wts * np.prod(pts**powers, axis=1))
        if cell in ("quad", "hexahedron"):
            exact = np.prod([1.0 / (p + 1) for p in powers])
        elif cell == "triangle":
            from math import factorial

            a, b = powers
            exact = factorial(a) * factorial(b) / factorial(a + b + 2)
        else:
            from math import factorial

            a, b, c = powers
            exact = factorial(a) * factorial(b) * factorial(c) / factorial(a + b + c + 3)
        np.testing.assert_allclose(val, exact, rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize(
    "cell,deg", [("triangle", 1), ("triangle", 2), ("quad", 1), ("quad", 2),
                 ("tetrahedron", 1), ("tetrahedron", 2), ("hexahedron", 1)]
)
def test_partition_of_unity_and_kronecker(cell, deg):
    el = ReferenceElement(cell, deg, 2)
    np.testing.assert_allclose(el.N.sum(axis=1), 1.0, atol=1e-13)
    np.testing.assert_allclose(el.dN.sum(axis=1), 0.0, atol=1e-12)
    # Kronecker delta property at the nodes
    vals = el.tabulate(el.nodes)
    np.testing.assert_allclose(vals, np.eye(el.nnodes), atol=1e-12)


def test_domain_measures():
    mesh = create_unit_square(3, 4, "triangle")
    V = FunctionSpace(mesh, 1, (2,))
    dom = QuadratureDomain(V, 2)
    np.testing.assert_allclose(float(assemble_scalar(dom, 1.0)), 1.0, rtol=1e-13)
    mesh3 = create_unit_cube(2, 2, 2, "tetrahedron")
    V3 = FunctionSpace(mesh3, 1, (3,))
    dom3 = QuadratureDomain(V3, 2)
    np.testing.assert_allclose(float(assemble_scalar(dom3, 1.0)), 1.0, rtol=1e-13)


@pytest.mark.parametrize("cell_type", ["quad", "triangle"])
@pytest.mark.parametrize("order", [1, 2])
def test_elastic_patch(cell_type, order):
    """Homogeneous uniaxial-strain patch: exact at any resolution/order."""
    mat_module = __import__("dolfinx_materials_tpu", fromlist=["Material"])
    mat = mat_module.Material(LinearElasticIsotropic(E, nu))
    exx = 1e-3
    Stress, u, qmap = uniaxial_tension_2D(
        mat, np.array([0.0, exx]), N=2, order=order, cell_type=cell_type
    )
    C = np.asarray(tn.isotropic_C(E, nu))
    # plane strain, eyy from syy=0: the BCs impose eps = (exx, eyy*, 0, 0, ...)
    # with eyy free -> solution minimizes energy: syy = 0
    lmbda = E * nu / (1 + nu) / (1 - 2 * nu)
    mu = E / 2 / (1 + nu)
    eyy = -lmbda / (lmbda + 2 * mu) * exx
    eps = np.array([exx, eyy, 0, 0, 0, 0])
    sig_expected = C @ eps
    np.testing.assert_allclose(Stress[1], sig_expected, rtol=1e-9, atol=1e-9 * E)
    # displacement field is exactly linear
    coords = u.space.node_coords
    ux = u.x[::2]
    np.testing.assert_allclose(ux, exx * coords[:, 0], atol=1e-12)


@pytest.mark.parametrize("mesh_size", [1, 2, 4])
def test_j2_plasticity_uniaxial_closed_form(mesh_size):
    """Plane-strain J2 perfect plasticity: final stress -> 2/sqrt(3)[sig0, 0, sig0/2]
    (the reference's analytic check, tests/mfront/test_elastoplasticity.py:31-36)."""
    mat_module = __import__("dolfinx_materials_tpu", fromlist=["Material"])
    mat = mat_module.Material(
        vonMisesIsotropicHardening(
            LinearElasticIsotropic(E, nu), LinearHardening(sig0, 0.0)
        )
    )
    Exx = np.linspace(0, 12 * sig0 / E, 15)
    Stress, u, qmap = uniaxial_tension_2D(mat, Exx, N=mesh_size, order=1)
    sig_final = Stress[-1]
    expected = 2 / np.sqrt(3) * np.array([sig0, 0.0, sig0 / 2, 0, 0, 0])
    np.testing.assert_allclose(sig_final, expected, rtol=1e-2, atol=1e-7)
    # all Gauss points carry the same homogeneous state
    all_sig = np.asarray(mat.data_manager.s0["Stress"])
    np.testing.assert_allclose(
        all_sig,
        np.broadcast_to(all_sig[0], all_sig.shape),
        rtol=1e-6,
        atol=1e-6 * sig0,
    )


@pytest.mark.slow
def test_j2_krylov_matches_lu():
    """Matrix-free Jacobi-CG path reproduces the host LU path."""
    mat_module = __import__("dolfinx_materials_tpu", fromlist=["Material"])
    Exx = np.linspace(0, 3 * sig0 / E, 6)
    res = {}
    for ksp in ["lu", "cg"]:
        mat = mat_module.Material(
            vonMisesIsotropicHardening(
                LinearElasticIsotropic(E, nu), LinearHardening(sig0, 500.0)
            )
        )
        Stress, _, _ = uniaxial_tension_2D(mat, Exx, N=2, order=2, ksp_type=ksp)
        res[ksp] = Stress
    np.testing.assert_allclose(res["cg"], res["lu"], rtol=1e-7, atol=1e-6 * sig0)


@pytest.mark.slow
def test_stencil_assembly_matches_general_path():
    """Structured-grid stencil gathers/assembly (shifted slices) must equal the
    general dofmap gather / gather-map assembly exactly, 2D and 3D, and the
    prepared feature-major SpMV must match the raw-layout SpMV."""
    import jax.numpy as jnp

    from dolfinx_materials_tpu.fem import create_box
    from dolfinx_materials_tpu.fem.assembly import QuadratureDomain

    rng = np.random.default_rng(0)
    for mesh, shape in [
        (create_unit_square(5, 4, "quad"), (2,)),
        (create_box((0, 0, 0), (1, 1, 1), (3, 2, 4), "hexahedron"), (3,)),
    ]:
        V = FunctionSpace(mesh, 1, shape)
        dom = QuadratureDomain(V, 2)
        assert dom._stencil is not None
        u = jnp.asarray(rng.standard_normal(V.num_dofs))
        np.testing.assert_array_equal(
            np.asarray(dom.gather(u)), np.asarray(u)[np.asarray(dom.dofmap)]
        )
        ve = jnp.asarray(rng.standard_normal((dom.ne, dom.ndof_el)))
        vals = jnp.concatenate([ve.ravel(), jnp.zeros(1)])
        s_general = jnp.sum(vals[dom._gather_map], axis=1)
        np.testing.assert_allclose(
            np.asarray(dom.scatter_dofs(ve)), np.asarray(s_general), atol=1e-13
        )
        K_e = jnp.asarray(
            rng.standard_normal((dom.ne, dom.ndof_el, dom.ndof_el))
        )
        y_raw = dom.spmv(K_e, u)
        y_fm = dom.spmv(dom.spmv_prepare(K_e), u)
        np.testing.assert_allclose(
            np.asarray(y_fm), np.asarray(y_raw), rtol=1e-12, atol=1e-12
        )
