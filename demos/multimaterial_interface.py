"""Multi-material composite with an elastic interface law (blocked solve).

Rebuild of the reference's flagship composition demo (reference
demos/multimaterials/multimaterials.py): a plate with a stiff inclusion strip,
TWO independent displacement fields on facing submeshes (dofs duplicated along
the interface), different plastic materials per subdomain, joined by the
elastic interface law t = K [[u]]. The monolithic blocked Newton solves both
fields plus the interface coupling in one operator.

Run: python demos/multimaterial_interface.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")
import jax.numpy as jnp

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.solvers import BlockedNonlinearProblem
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_rectangle,
    locate_dofs_geometrical,
    InterfaceDomain,
    InterfaceTerm,
    elastic_interface,
    extract_submesh,
    interface_facets,
)
from dolfinx_materials_tpu.fem.facets import assemble_traction
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
from dolfinx_materials_tpu.models import (
    LinearElasticIsotropic,
    LinearHardening,
    VoceHardening,
    vonMisesIsotropicHardening,
)


def main():
    # matrix (x < 0.6) and stiff inclusion strip (x > 0.6), as in the reference
    # demo's matrix/inclusion split
    parent = create_rectangle((0, 0), (1.0, 0.5), (20, 10), "quad")
    centers = parent.cell_centers()
    cells_m = np.nonzero(centers[:, 0] < 0.6)[0].astype(np.int32)
    cells_i = np.nonzero(centers[:, 0] > 0.6)[0].astype(np.int32)

    mesh_m, vmap_m = extract_submesh(parent, cells_m)
    mesh_i, vmap_i = extract_submesh(parent, cells_i)
    Vm = FunctionSpace(mesh_m, 1, (2,))
    Vi = FunctionSpace(mesh_i, 1, (2,))

    # matrix: softer, linear hardening (the reference's Hosford matrix role);
    # inclusion: stiffer, Voce hardening (the reference's jaxmat vonMises+Voce)
    mat_m = Material(
        vonMisesIsotropicHardening(
            LinearElasticIsotropic(70e3, 0.3), LinearHardening(200.0, 1000.0)
        )
    )
    mat_i = Material(
        vonMisesIsotropicHardening(
            LinearElasticIsotropic(90e3, 0.25), VoceHardening(200.0, 300.0, 10.0)
        )
    )
    qm = QuadratureMap(Vm, 2, mat_m)
    qm.register_gradient("Strain", mandel_strain_2d())
    qi = QuadratureMap(Vi, 2, mat_i)
    qi.register_gradient("Strain", mandel_strain_2d())

    left = locate_dofs_geometrical(Vm, lambda x: np.isclose(x[:, 0], 0.0), 0)
    botm = locate_dofs_geometrical(Vm, lambda x: np.isclose(x[:, 1], 0.0), 1)
    boti = locate_dofs_geometrical(Vi, lambda x: np.isclose(x[:, 1], 0.0), 1)
    u_m, u_i = Function(Vm), Function(Vi)

    p_m = NonlinearMaterialProblem(
        qm, u_m, bcs=[DirichletBC(left, 0.0), DirichletBC(botm, 0.0)],
        options={"ksp_type": "lu"},
    )
    s_load = 260.0  # sigma_eq ~ 231 in plane strain: matrix yields
    F_i = assemble_traction(
        Vi, lambda x: np.isclose(x[:, 0], 1.0), np.array([s_load, 0.0])
    )
    p_i = NonlinearMaterialProblem(
        qi, u_i, bcs=[DirichletBC(boti, 0.0)], external_force=F_i,
        options={"ksp_type": "lu"},
    )

    fvp = interface_facets(parent, cells_m, cells_i)
    dom = InterfaceDomain(Vm, Vi, fvp, vmap_m, vmap_i)
    K_int = 1e5
    blocked = BlockedNonlinearProblem(
        [p_m, p_i],
        interfaces=[InterfaceTerm(0, 1, dom, elastic_interface(K_int))],
        options={"ksp_type": "lu", "verbose": True},
    )

    ok, its = blocked.solve()
    assert ok, "blocked interface solve failed"
    assert float(np.asarray(mat_m.data_manager.s0["p"]).max()) > 1e-4
    jump = np.asarray(dom.jump(jnp.asarray(u_m.x), jnp.asarray(u_i.x)))
    p_max_m = float(np.asarray(mat_m.data_manager.s0["p"]).max())
    p_max_i = float(np.asarray(mat_i.data_manager.s0["p"]).max())
    print(f"converged in {its} Newton its")
    print(f"matrix p_max = {p_max_m:.4f} (plastic), inclusion p_max = {p_max_i:.4f}")
    print(f"interface jump_x: mean {jump[..., 0].mean():.3e}, max {jump[..., 0].max():.3e}")
    print(f"|u| max: matrix {np.abs(u_m.x).max():.3e}, inclusion {np.abs(u_i.x).max():.3e}")
    return its, p_max_m, jump


if __name__ == "__main__":
    main()
