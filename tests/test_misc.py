"""Cross-cutting robustness: rotation plumbing for 9-vector fields, material
property rebuilds, PerformanceWarning category, state manager views."""

import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material, PerformanceWarning
from dolfinx_materials_tpu.models import (
    LinearElasticIsotropic,
    LinearElasticOrthotropic,
    SaintVenantKirchhoff,
)
from dolfinx_materials_tpu.ops import tensors as tn


def rand_rot(seed):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def test_rotation_isotropic_objectivity_finite_strain():
    """For an ISOTROPIC finite-strain material the material-frame rotation must
    not change the response — exercises the 9-vector (Q9) rotation path."""
    rng = np.random.default_rng(0)
    Fv = jnp.asarray(
        np.broadcast_to(np.asarray(tn.I9), (6, 9)) + 0.1 * rng.normal(size=(6, 9))
    )
    m_plain = Material(SaintVenantKirchhoff(70e3, 0.3))
    P0, _, C0 = m_plain.integrate(Fv)

    m_rot = Material(SaintVenantKirchhoff(70e3, 0.3))
    m_rot.rotation_matrix = jnp.asarray(rand_rot(1))
    P1, _, C1 = m_rot.integrate(Fv)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(P0), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(C1), np.asarray(C0), rtol=1e-8, atol=1e-6)


def test_rotation_orthotropic_changes_response():
    """An orthotropic material must respond differently in a rotated frame, and a
    90-degree rotation about z must swap the 11/22 responses."""
    beh = LinearElasticOrthotropic(
        E1=100e3, E2=10e3, E3=10e3, nu12=0.3, nu13=0.3, nu23=0.3,
        G12=5e3, G13=5e3, G23=4e3,
    )
    eps = jnp.zeros((1, 6)).at[0, 0].set(1e-3)
    m0 = Material(beh)
    s0, _, _ = m0.integrate(eps)

    m90 = Material(beh)
    m90.rotation_matrix = jnp.asarray(
        [[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
    )
    s90, _, _ = m90.integrate(eps)
    assert not np.allclose(np.asarray(s90), np.asarray(s0))
    # loading e_xx in a frame rotated 90deg about z = loading e_yy in material
    # axes: sig_xx(global) must equal material sigma_22 response magnitude
    eps_yy = jnp.zeros((1, 6)).at[0, 1].set(1e-3)
    m0b = Material(beh)
    s_mat, _, _ = m0b.integrate(eps_yy)
    np.testing.assert_allclose(float(s90[0, 0]), float(s_mat[0, 1]), rtol=1e-10)


def test_update_material_property_rebuild():
    mat = Material(LinearElasticIsotropic(70e3, 0.3))
    eps = jnp.zeros((2, 6)).at[:, 0].set(1e-3)
    s1, _, _ = mat.integrate(eps)
    mat.update_material_property("E", 140e3)
    s2, _, _ = mat.integrate(eps)
    np.testing.assert_allclose(np.asarray(s2), 2 * np.asarray(s1), rtol=1e-12)


def test_performance_warning_is_userwarning():
    assert issubclass(PerformanceWarning, UserWarning)


def test_state_manager_views_and_dict_roundtrip():
    from dolfinx_materials_tpu.models import LinearHardening, vonMisesIsotropicHardening

    mat = Material(
        vonMisesIsotropicHardening(
            LinearElasticIsotropic(70e3, 0.3), LinearHardening(350.0, 100.0)
        )
    )
    mat.set_data_manager(5)
    d = mat.get_initial_state_dict()
    assert set(d) == {"Strain", "Stress", "eps_p", "p"}
    d["p"] = np.full(5, 0.01)
    mat.set_initial_state_dict(d)
    np.testing.assert_allclose(
        np.asarray(mat.data_manager.s0["p"]).ravel(), 0.01
    )


def test_update_material_property_invalidates_fast_path():
    """Regression (ADVICE r1): behaviors caching a whole-batch fast kernel
    (vonMisesIsotropicHardening._fast) must not keep serving pre-update
    parameters after update_material_property."""
    from dolfinx_materials_tpu.models import (
        LinearHardening,
        vonMisesIsotropicHardening,
    )

    mat = Material(
        vonMisesIsotropicHardening(
            LinearElasticIsotropic(70e3, 0.3), LinearHardening(350.0, 100.0)
        )
    )
    mat.set_data_manager(2)
    eps = jnp.zeros((2, 6)).at[:, 0].set(3 * 350.0 / 70e3)  # well plastic
    s_old, _, _ = mat.integrate(eps)
    assert mat._fast_update is not None  # the cached fast path is in play

    mat.update_material_property("yield_stress", LinearHardening(700.0, 100.0))
    mat.data_manager.s0["eps_p"] = np.zeros((2, 6))
    mat.data_manager.s0["p"] = np.zeros((2, 1))
    s_new, _, _ = mat.integrate(eps)
    assert not np.allclose(np.asarray(s_new), np.asarray(s_old))
    # doubled yield stress with same (still-plastic) strain -> higher stress
    assert float(s_new[0, 0]) > float(s_old[0, 0]) * 1.2


def test_axisymmetric_strain_mandel_layout():
    """Regression (ADVICE r1): the r-z shear belongs in the Mandel 13-slot
    (index 4), coupling e_rr with e_zz in sym_to_mat — not the 12-slot."""
    from dolfinx_materials_tpu.fem.forms import Ctx, axisymmetric_strain

    expr = axisymmetric_strain()
    # u = (u_r, u_z) with grad = [[du_r/dr, du_r/dz], [du_z/dr, du_z/dz]]
    g = jnp.array([[1e-3, 4e-3], [2e-3, 3e-3]])
    ctx = Ctx(u=jnp.array([5e-3, 0.0]), grad=g, x=jnp.array([2.0, 0.0]))
    eps = np.asarray(expr(ctx))
    np.testing.assert_allclose(eps[0], 1e-3)  # e_rr
    np.testing.assert_allclose(eps[1], 5e-3 / 2.0)  # e_tt = u_r / r
    np.testing.assert_allclose(eps[2], 3e-3)  # e_zz
    np.testing.assert_allclose(eps[3], 0.0)  # no r-theta shear
    np.testing.assert_allclose(eps[4], np.sqrt(2) * 3e-3)  # s2 * e_rz
    np.testing.assert_allclose(eps[5], 0.0)
    # sym_to_mat must place the shear coupling (r, z) = entries (0, 2)/(2, 0)
    M = np.asarray(tn.sym_to_mat(jnp.asarray(eps)))
    np.testing.assert_allclose(M[0, 2], 3e-3)
    np.testing.assert_allclose(M[0, 1], 0.0)


def test_integrate_flux_only_matches_full():
    """Tangent-free path must return the same flux/state as the full path
    (it feeds line-search residual trials)."""
    from dolfinx_materials_tpu.models import VoceHardening, vonMisesIsotropicHardening
    from dolfinx_materials_tpu.models.viscoplasticity import NortonViscoplasticity

    # generic (non-fast-path) behavior with an ISV so new_state is exercised
    beh = NortonViscoplasticity(
        LinearElasticIsotropic(70e3, 0.3), lambda p: 100.0 + 0 * p, K=150.0, n=3.0
    )
    mat = Material(beh)
    mat.set_data_manager(8)
    rng = np.random.default_rng(3)
    eps = jnp.asarray(rng.normal(size=(8, 6)) * 5e-3)
    f1, isv1 = mat.integrate_flux_only(eps, dt=0.1)
    mat2 = Material(
        NortonViscoplasticity(
            LinearElasticIsotropic(70e3, 0.3), lambda p: 100.0 + 0 * p, K=150.0, n=3.0
        )
    )
    mat2.set_data_manager(8)
    f2, isv2, Ct = mat2.integrate(eps, dt=0.1)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(isv1), np.asarray(isv2), rtol=1e-12)
