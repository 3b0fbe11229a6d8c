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
