"""Pressurized thick cylinder on CURVED isoparametric cells vs the Lamé
closed form — the round-2 geometry features in one script: Q2 (quadratic)
displacement spaces, `curve_mesh` degree-2 geometry, facet tractions.

The reference gets curved cells from gmsh second-order elements through
basix/DOLFINx (reference: dolfinx_materials/utils.py:84-95 + gmsh demos);
here the polar map curves a structured rectangle exactly.

Run: python demos/curved_cylinder.py [N]
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
    assemble_traction,
    create_rectangle,
    curve_mesh,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
from dolfinx_materials_tpu.models import LinearElasticIsotropic

E, nu = 70e3, 0.3
Ri, Re, p = 1.0, 2.0, 10.0


def solve_annulus(N, curved):
    base = create_rectangle((Ri, 0.0), (Re, np.pi / 2), (N, N), "quad")

    def polar(x):
        r, th = x[:, 0], x[:, 1]
        return np.stack([r * np.cos(th), r * np.sin(th)], axis=1)

    if curved:
        mesh = curve_mesh(base, polar)
    else:
        mesh = create_rectangle((Ri, 0.0), (Re, np.pi / 2), (N, N), "quad")
        mesh.points = polar(mesh.points)

    V = FunctionSpace(mesh, degree=2, shape=(2,))
    x_axis = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0.0), 1)
    y_axis = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0.0), 0)

    mat = Material(LinearElasticIsotropic(E, nu))
    qmap = QuadratureMap(V, 4, mat)
    qmap.register_gradient("Strain", mandel_strain_2d())
    u = Function(V)
    F = assemble_traction(
        V,
        lambda x: np.linalg.norm(x, axis=1) < Ri + 0.5 / N,
        lambda x: p * x / np.linalg.norm(x, axis=1, keepdims=True),
    )
    problem = NonlinearMaterialProblem(
        qmap,
        u,
        bcs=[DirichletBC(x_axis, 0.0), DirichletBC(y_axis, 0.0)],
        options={"ksp_type": "lu", "rtol": 1e-12},
    )
    problem.external_force = F
    conv, _ = problem.solve()
    assert conv

    x_q = np.asarray(qmap.domain.x_q).reshape(-1, 2)
    r_q = np.linalg.norm(x_q, axis=1)
    sig = np.asarray(mat.data_manager.s0["Stress"])
    th = np.arctan2(x_q[:, 1], x_q[:, 0])
    c, s = np.cos(th), np.sin(th)
    sig_tt = sig[:, 0] * s**2 + sig[:, 1] * c**2 - np.sqrt(2) * sig[:, 3] * s * c
    sig_tt_exact = p * Ri**2 / (Re**2 - Ri**2) * (1 + Re**2 / r_q**2)
    return float(np.max(np.abs(sig_tt - sig_tt_exact) / np.abs(sig_tt_exact)))


def main(N=6):
    print(f"{N}x{N} quarter annulus, P2 displacements, hoop stress vs Lame:")
    for curved in (False, True):
        err = solve_annulus(N, curved)
        label = "curved (isoparametric Q2 geometry)" if curved else "straight edges"
        print(f"  {label:38s} max rel error {err:.2e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
