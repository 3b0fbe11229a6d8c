"""State initialization, spatially-varying material properties, and
checkpoint/resume — rebuild of the reference's tests/mfront/test_initialization.py
(scalar/array/callable initial values at :61-110, re-assignable varying
properties at :113-153) plus the checkpoint capability the reference lacks."""

import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material, QuadratureMap
from dolfinx_materials_tpu.checkpoint import load_state, save_state
from dolfinx_materials_tpu.fem import FunctionSpace, create_unit_square
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
from dolfinx_materials_tpu.models import (
    LinearElasticIsotropic,
    LinearHardening,
    vonMisesIsotropicHardening,
)
from dolfinx_materials_tpu.models.base import SmallStrainBehavior

E, nu, sig0 = 70e3, 0.3, 350.0


def make_qmap():
    mesh = create_unit_square(2, 2, "quad")
    V = FunctionSpace(mesh, 1, (2,))
    mat = Material(
        vonMisesIsotropicHardening(
            LinearElasticIsotropic(E, nu), LinearHardening(sig0, 1000.0)
        )
    )
    qmap = QuadratureMap(V, 2, mat)
    qmap.register_gradient("Strain", mandel_strain_2d())
    return qmap, mat


def test_update_initial_state_scalar_array_callable():
    qmap, mat = make_qmap()
    n = qmap.num_points

    qmap.update_initial_state("p", 0.01)
    np.testing.assert_allclose(np.asarray(mat.data_manager.s0["p"]), 0.01)

    vals = np.linspace(0, 1, n)
    qmap.update_initial_state("p", vals)
    np.testing.assert_allclose(
        np.asarray(mat.data_manager.s0["p"]).ravel(), vals
    )

    # callable of physical coordinates (the Function-valued case, reference :93-110)
    qmap.update_initial_state("p", lambda x: x[:, 0] * 0.5)
    xq = np.asarray(qmap.domain.x_q).reshape(n, -1)
    np.testing.assert_allclose(
        np.asarray(mat.data_manager.s0["p"]).ravel(), 0.5 * xq[:, 0]
    )

    # vector-valued field init
    eps_p0 = np.zeros((n, 6))
    eps_p0[:, 3] = 1e-3
    qmap.update_initial_state("eps_p", eps_p0)
    np.testing.assert_allclose(np.asarray(mat.data_manager.s0["eps_p"]), eps_p0)

    # initialized state feeds the next integrate: with p0 = 0.01 the yield stress
    # is sig0 + H * 0.01
    qmap.update_initial_state("eps_p", np.zeros((n, 6)))
    qmap.update_initial_state("p", 0.01)
    eps = jnp.zeros((n, 6)).at[:, 3].set(0.05)
    sig, _, _ = mat.integrate(eps)
    from dolfinx_materials_tpu.ops import tensors as tn

    q = np.asarray(tn.eq_vm(sig))
    p1 = np.asarray(mat.data_manager.s1["p"]).ravel()
    np.testing.assert_allclose(q, sig0 + 1000.0 * p1, rtol=1e-9)
    assert (p1 > 0.01).all()


class VaryingElasticity(SmallStrainBehavior):
    """Behavior with a spatially-varying Young modulus material property
    (reference test: re-assignable, Function-valued props, :113-153)."""

    material_properties = {"YoungModulus": 1}

    def __init__(self, nu):
        self.nu = nu

    def constitutive_update(self, inputs, state, dt):
        E = inputs["YoungModulus"]
        eps = inputs["Strain"]
        lmbda = E * self.nu / (1 + self.nu) / (1 - 2 * self.nu)
        mu = E / 2 / (1 + self.nu)
        from dolfinx_materials_tpu.ops import tensors as tn

        sig = lmbda * tn.tr(eps) * jnp.asarray(tn.I2, eps.dtype) + 2 * mu * eps
        return {"Stress": sig}, state


def test_spatially_varying_material_property():
    mesh = create_unit_square(2, 2, "quad")
    V = FunctionSpace(mesh, 1, (2,))
    mat = Material(VaryingElasticity(nu))
    qmap = QuadratureMap(V, 2, mat)
    qmap.register_gradient("Strain", mandel_strain_2d())
    n = qmap.num_points

    # scalar value
    mat.update_material_property("YoungModulus", E)
    eps = jnp.zeros((n, 6)).at[:, 0].set(1e-3)
    sig1, _, _ = mat.integrate(eps)

    # per-point array: doubled stiffness on the second half
    Evar = np.full(n, E)
    Evar[n // 2 :] = 2 * E
    mat.update_material_property("YoungModulus", Evar)
    sig2, _, _ = mat.integrate(eps)
    np.testing.assert_allclose(np.asarray(sig2)[: n // 2], np.asarray(sig1)[: n // 2])
    np.testing.assert_allclose(
        np.asarray(sig2)[n // 2 :], 2 * np.asarray(sig1)[n // 2 :], rtol=1e-12
    )


def test_checkpoint_roundtrip(tmp_path):
    qmap, mat = make_qmap()
    n = qmap.num_points
    eps = jnp.zeros((n, 6)).at[:, 0].set(3 * sig0 / E)
    mat.integrate(eps)
    mat.data_manager.update()
    p_ref = np.asarray(mat.data_manager.s0["p"]).copy()
    assert p_ref.max() > 0

    path = tmp_path / "state.npz"
    save_state(path, qmap, extra={"step": np.asarray(7)})

    qmap2, mat2 = make_qmap()
    extra = load_state(path, qmap2)
    assert int(extra["step"]) == 7
    np.testing.assert_allclose(np.asarray(mat2.data_manager.s0["p"]), p_ref)

    # resumed state continues identically
    sig_a, _, _ = mat.integrate(2 * eps)
    sig_b, _, _ = mat2.integrate(2 * eps)
    np.testing.assert_allclose(np.asarray(sig_b), np.asarray(sig_a), rtol=1e-14)
