"""Plane-stress wrapper and axisymmetric kinematics tests (the reference's
MFront hypothesis map, mfront.py:33-38, and axi_grad, utils.py:215-237)."""

import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_rectangle,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.forms import axisymmetric_strain
from dolfinx_materials_tpu.models import (
    LinearElasticIsotropic,
    LinearHardening,
    PlaneStress,
    vonMisesIsotropicHardening,
)
from uniaxial_tension import uniaxial_tension_2D

E, nu, sig0 = 70e3, 0.3, 350.0


def test_plane_stress_elastic():
    """Elastic plane stress, free lateral contraction -> TRUE uniaxial stress:
    sig_xx = E exx exactly, sig_yy = sig_zz = 0, ezz = -nu exx."""
    mat = Material(PlaneStress(LinearElasticIsotropic(E, nu)))
    exx = 1e-3
    Stress, u, qmap = uniaxial_tension_2D(mat, np.array([0.0, exx]), N=2, order=1)
    sig = Stress[1]
    np.testing.assert_allclose(sig[2], 0.0, atol=1e-9 * E * exx)  # sig_zz = 0
    np.testing.assert_allclose(sig[0], E * exx, rtol=1e-9)
    np.testing.assert_allclose(sig[1], 0.0, atol=1e-9 * E * exx)
    # solved out-of-plane strain
    ezz = np.asarray(mat.data_manager.s0["eps_zz"]).ravel()
    np.testing.assert_allclose(ezz, -nu * exx, rtol=1e-9)
    # vs plane STRAIN (uniaxial harness): sig_xx = (lmbda + 2mu - lmbda^2/(lmbda+2mu)) exx > E exx
    mat2 = Material(LinearElasticIsotropic(E, nu))
    S2, _, _ = uniaxial_tension_2D(mat2, np.array([0.0, exx]), N=2, order=1)
    assert S2[1][0] > sig[0]  # hypotheses genuinely differ
    assert abs(S2[1][2]) > 1e-3 * E * exx  # plane strain carries sig_zz


def test_plane_stress_plasticity_yield():
    """Plane-stress J2: under the BC-driven state the von Mises stress sits on
    the hardening curve, and sig_zz stays 0 through plastic flow."""
    mat = Material(
        PlaneStress(
            vonMisesIsotropicHardening(
                LinearElasticIsotropic(E, nu), LinearHardening(sig0, 1000.0)
            )
        )
    )
    Exx = np.linspace(0, 10 * sig0 / E, 12)
    Stress, u, qmap = uniaxial_tension_2D(mat, Exx, N=1, order=1)
    from dolfinx_materials_tpu.ops import tensors as tn

    sig = Stress[-1]
    np.testing.assert_allclose(sig[2], 0.0, atol=1e-6 * sig0)
    p = np.asarray(mat.data_manager.s0["p"]).ravel()
    assert p.max() > 1e-3
    q = float(tn.eq_vm(jnp.asarray(sig)))
    np.testing.assert_allclose(q, sig0 + 1000.0 * p[0], rtol=1e-6)


def test_axisymmetric_thick_cylinder():
    """Pressurized thick-walled cylinder (plane strain axisymmetric): Lamé
    solution sig_rr(r), sig_tt(r)."""
    a, b_r, pin = 1.0, 2.0, 10.0
    mesh = create_rectangle((a, 0.0), (b_r, 0.1), (40, 1), "quad")
    V = FunctionSpace(mesh, 1, (2,))
    mat = Material(LinearElasticIsotropic(E, nu))
    qmap = QuadratureMap(
        V, 2, mat, weight=lambda x: 2 * np.pi * x[:, 0]
    )
    qmap.register_gradient("Strain", axisymmetric_strain())

    # plane-strain in z: uz = 0 everywhere (both horizontal faces)
    uz = locate_dofs_geometrical(V, lambda x: np.full(len(x), True), 1)
    bcs = [DirichletBC(uz, 0.0)]
    # internal pressure on r = a: traction +p e_r over area 2 pi a * h
    from dolfinx_materials_tpu.fem.facets import assemble_traction

    F = assemble_traction(V, lambda x: np.isclose(x[:, 0], a), np.array([pin, 0.0]))
    # axisymmetric measure on the facet: multiply by 2 pi r (constant r = a here)
    F = F * 2 * np.pi * a

    u = Function(V)
    prob = NonlinearMaterialProblem(
        qmap, u, bcs=bcs, external_force=F, options={"ksp_type": "lu"}
    )
    converged, _ = prob.solve()
    assert converged

    sig = np.asarray(mat.data_manager.s0["Stress"])
    r = np.asarray(qmap.domain.x_q).reshape(-1, 2)[:, 0]
    A = pin * a**2 / (b_r**2 - a**2)
    sig_rr = A * (1 - b_r**2 / r**2)
    sig_tt = A * (1 + b_r**2 / r**2)
    # P1 Gauss-point stresses oscillate around the exact profile at ~element
    # scale; pointwise within 5% of the pressure, radial PROFILE within 2%.
    np.testing.assert_allclose(sig[:, 0], sig_rr, atol=5e-2 * pin)
    np.testing.assert_allclose(sig[:, 1], sig_tt, rtol=5e-2)
    order = np.argsort(r)
    smooth = np.convolve(sig[order, 1], np.ones(4) / 4, mode="valid")
    np.testing.assert_allclose(
        smooth, np.convolve(sig_tt[order], np.ones(4) / 4, mode="valid"), rtol=2e-2
    )
    # plane strain: sig_zz = nu (sig_rr + sig_tt)
    np.testing.assert_allclose(
        sig[:, 2], nu * (sig[:, 0] + sig[:, 1]), rtol=1e-9
    )
