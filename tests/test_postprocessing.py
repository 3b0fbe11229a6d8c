"""Postprocessing parity (VERDICT r2 missing #6): project_on prefix-collection
of scalar ISV components + array-valued ISV projection, reference
quadrature_map.py:377-387."""

import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material, QuadratureMap
from dolfinx_materials_tpu.fem import FunctionSpace, create_unit_square
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
from dolfinx_materials_tpu.models import MericCailletaudCrystalPlasticity
from dolfinx_materials_tpu.models.base import SmallStrainBehavior


class _FlattenedISVBehavior(SmallStrainBehavior):
    """Elastic behavior with MFront-style FLATTENED scalar ISVs q0, q1, q2
    (the reference's bracketed-name flattening, mfront.py:26-30)."""

    def __init__(self):
        from dolfinx_materials_tpu.ops import tensors

        self.C = tensors.isotropic_C(70e3, 0.3)

    def init_state(self):
        return {
            "q0": jnp.zeros(()),
            "q1": jnp.zeros(()),
            "q2": jnp.zeros(()),
            "other": jnp.zeros(()),
        }

    def small_strain_update(self, eps, state, dt):
        sig = self.C @ eps
        return sig, {
            "q0": eps[0],
            "q1": 2.0 * eps[0],
            "q2": 3.0 * eps[0],
            "other": eps[1],
        }


def _setup(mat):
    mesh = create_unit_square(3, 3, "quad")
    V = FunctionSpace(mesh, 1, (2,))
    qmap = QuadratureMap(V, 2, mat)
    qmap.register_gradient("Strain", mandel_strain_2d())
    eps = np.zeros((qmap.num_points, 6))
    eps[:, 0] = 1e-3
    mat.integrate(jnp.asarray(eps))
    mat.data_manager.update()
    return qmap


def test_project_on_prefix_collects_scalar_components():
    qmap = _setup(Material(_FlattenedISVBehavior()))
    out = qmap.project_on("q", ("DG", 0))  # collects q0, q1, q2 — NOT 'other'
    assert out.shape == (qmap.domain.ne, 3)
    np.testing.assert_allclose(out[:, 0], 1e-3, rtol=1e-12)
    np.testing.assert_allclose(out[:, 1], 2e-3, rtol=1e-12)
    np.testing.assert_allclose(out[:, 2], 3e-3, rtol=1e-12)


def test_project_on_unknown_name_raises():
    qmap = _setup(Material(_FlattenedISVBehavior()))
    try:
        qmap.project_on("nope")
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "nope" in str(e)


def test_project_on_crystal_array_isv():
    """Crystal p is stored natively as a (12,) array field: exact-name
    projection yields the full 12-component slip state per cell."""
    qmap = _setup(Material(MericCailletaudCrystalPlasticity()))
    out = qmap.project_on("p", ("DG", 0))
    assert out.shape == (qmap.domain.ne, 12)
    assert np.isfinite(out).all()
