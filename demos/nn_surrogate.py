"""Neural-network surrogate constitutive model inside a FEM solve.

The reference's design point: behaviors are parameter pytrees, so learned
constitutive models drop in (reference docs/jax.md:36-44). Here: generate
stress-strain data from a reference elastic law, train an MLP surrogate with
optax, wrap it in a Material — the adapter's forward-mode pass provides exact
consistent tangents of the NETWORK, so the global Newton solve works unchanged —
and compare the FEM solution against the ground-truth material.

Run: python demos/nn_surrogate.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_unit_square,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
from dolfinx_materials_tpu.models import LinearElasticIsotropic, NeuralBehavior
from dolfinx_materials_tpu.ops import tensors as tn


def main(steps=3000):
    E, nu = 70e3, 0.3

    # --- data + training --------------------------------------------------
    rng = np.random.default_rng(0)
    eps_data = rng.normal(size=(2048, 6)) * 1e-3
    C = np.asarray(tn.isotropic_C(E, nu))
    sig_data = eps_data @ C.T
    surrogate = NeuralBehavior(layers=(6, 48, 48, 6), input_scale=1e3, output_scale=100.0)
    hist = surrogate.fit(eps_data, sig_data, steps=steps, learning_rate=3e-3)
    print(f"training: loss {hist[0]:.3e} -> {hist[-1]:.3e}")

    # --- FEM solves: surrogate vs ground truth ----------------------------
    def solve_with(mat):
        mesh = create_unit_square(8, 8, "quad")
        V = FunctionSpace(mesh, 1, (2,))
        qmap = QuadratureMap(V, 2, mat)
        qmap.register_gradient("Strain", mandel_strain_2d())
        left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0), 0)
        bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0), 1)
        right = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1), 0)
        u = Function(V)
        prob = NonlinearMaterialProblem(
            qmap,
            u,
            bcs=[DirichletBC(left, 0.0), DirichletBC(bottom, 0.0),
                 DirichletBC(right, 1e-3)],
            options={"ksp_type": "lu", "rtol": 1e-8, "atol": 1e-6},
        )
        converged, it = prob.solve()
        assert converged
        return u.x, it

    u_nn, it_nn = solve_with(Material(surrogate))
    u_ref, it_ref = solve_with(Material(LinearElasticIsotropic(E, nu)))
    err = np.linalg.norm(u_nn - u_ref) / np.linalg.norm(u_ref)
    print(
        f"FEM with NN surrogate: {it_nn} Newton its (exact AD tangents of the net); "
        f"displacement error vs ground truth: {err:.2%}"
    )


if __name__ == "__main__":
    main()
