"""Crystal plasticity tests: Schmid-law sanity, FCC geometry, and the reference's
orientation-invariance FEM test (tests/mfront/test_elastoplasticity.py:39-62)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dolfinx_materials_tpu import Material
from dolfinx_materials_tpu.models import MericCailletaudCrystalPlasticity
from dolfinx_materials_tpu.models.crystal import (
    fcc_interaction_matrix,
    fcc_slip_systems,
    schmid_tensors_mandel,
)
from dolfinx_materials_tpu.ops import tensors as tn
from uniaxial_tension import uniaxial_tension_2D


def test_fcc_geometry():
    normals, dirs = fcc_slip_systems()
    assert normals.shape == (12, 3)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-14)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=1), 1.0, atol=1e-14)
    np.testing.assert_allclose(np.sum(normals * dirs, axis=1), 0.0, atol=1e-14)
    mus = schmid_tensors_mandel(normals, dirs)
    # deviatoric and traceless: slip is isochoric
    np.testing.assert_allclose(mus[:, :3].sum(axis=1), 0.0, atol=1e-14)


def test_interaction_matrix_structure():
    H = fcc_interaction_matrix()
    assert H.shape == (12, 12)
    np.testing.assert_allclose(np.diag(H), 1.0)
    np.testing.assert_allclose(H, H.T)  # classification is symmetric
    # every off-diagonal entry belongs to one of the declared classes
    vals = set(np.round(H.ravel(), 6))
    assert vals <= {1.0, 0.6, 1.8, 1.6, 12.3}


def test_elastic_below_threshold_and_flow_above():
    beh = MericCailletaudCrystalPlasticity()
    mat = Material(beh)
    n = 4
    mat.set_data_manager(n)
    # tiny strain: elastic, stress = C eps, no slip
    eps = jnp.zeros((n, 6)).at[:, 0].set(1e-5)
    sig, isv, Ct = mat.integrate(eps, dt=0.1)
    np.testing.assert_allclose(
        np.asarray(sig), np.asarray(eps @ beh.C6.T), rtol=1e-9
    )
    assert float(jnp.max(jnp.abs(mat.data_manager.s1["g"]))) < 1e-12
    # large strain: viscoplastic slip activates
    eps2 = jnp.zeros((n, 6)).at[:, 3].set(5e-3)  # shear drives octahedral slip
    mat.data_manager.revert()
    sig2, _, _ = mat.integrate(eps2, dt=0.1)
    p = np.asarray(mat.data_manager.s1["p"])
    assert p.max() > 1e-5, "slip must activate above the threshold"
    # slip is isochoric: plastic strain trace = 0
    eps_p = np.asarray(mat.data_manager.s1["eps_p"])
    np.testing.assert_allclose(eps_p[:, :3].sum(axis=1), 0.0, atol=1e-12)


@pytest.mark.slow
def test_orientation_invariance_fem():
    """The reference's crystal rotation test: elastic step identical for all
    angles; final plastic state identical for 0 and 90 deg (cubic symmetry),
    different for 45/60 deg."""
    N = 12
    Exx = np.linspace(0, 5e-3, N + 1)
    angles = [0.0, np.pi / 4, np.pi / 3, np.pi / 2]
    Stresses = []
    for angle in angles:
        mat = Material(MericCailletaudCrystalPlasticity())
        S, _, _ = uniaxial_tension_2D(mat, Exx, N=1, angle=angle, dt=0.1)
        Stresses.append(S)
    for i in range(4):
        np.testing.assert_allclose(
            Stresses[i][1, :], Stresses[(i + 1) % 4][1, :], rtol=1e-6, atol=1e-8
        )
    np.testing.assert_allclose(Stresses[0][-1, :], Stresses[3][-1, :], rtol=1e-5, atol=1e-6)
    assert not np.allclose(Stresses[0][-1, :], Stresses[1][-1, :])
    assert not np.allclose(Stresses[0][-1, :], Stresses[2][-1, :])
