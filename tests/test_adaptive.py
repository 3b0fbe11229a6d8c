"""Adaptive load stepping with cutback (solve_adaptive) and solver metrics."""

import numpy as np

from dolfinx_materials_tpu import (
    Material,
    NonlinearMaterialProblem,
    QuadratureMap,
    solve_adaptive,
)
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_unit_square,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
from dolfinx_materials_tpu.models import (
    LinearElasticIsotropic,
    VoceHardening,
    vonMisesIsotropicHardening,
)
from dolfinx_materials_tpu.utils.timers import timing

E, sig0 = 70e3, 350.0


def make_problem(max_it=8):
    mesh = create_unit_square(4, 4, "quad")
    V = FunctionSpace(mesh, 1, (2,))
    mat = Material(
        vonMisesIsotropicHardening(
            LinearElasticIsotropic(E, 0.3), VoceHardening(sig0, 500.0, 1e3)
        )
    )
    qmap = QuadratureMap(V, 2, mat)
    qmap.register_gradient("Strain", mandel_strain_2d())
    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0), 0)
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0), 1)
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1), 0)
    bc = DirichletBC(right, 0.0)
    bcs = [DirichletBC(left, 0.0), DirichletBC(bottom, 0.0), bc]
    u = Function(V)
    problem = NonlinearMaterialProblem(
        qmap, u, bcs=bcs, options={"ksp_type": "lu", "max_it": max_it}
    )
    return problem, bc, mat, qmap


def test_adaptive_cutback_succeeds_where_single_step_fails():
    exx_end = 8 * sig0 / E  # deep plastic with sharp Voce saturation
    # single giant step with a tight iteration budget: fails
    p1, bc1, m1, q1 = make_problem(max_it=5)
    bc1.set(exx_end)
    converged, _ = p1.solve()
    assert not converged
    # revert the trial state like solve_adaptive would
    q1.revert()

    # adaptive stepping with the same iteration budget: succeeds
    p2, bc2, m2, q2 = make_problem(max_it=5)
    accepted = solve_adaptive(p2, bc2.set, exx_end, nsteps0=2)
    assert np.isclose(accepted[-1], exx_end)
    assert len(accepted) >= 2
    p = np.asarray(m2.data_manager.s0["p"])
    assert p.max() > 1e-3
    assert p2.metrics["converged"]
    assert p2.metrics["newton_iterations"] <= 5
    assert p2.metrics["residual_history"][-1] < p2.metrics["residual_history"][0]
    assert p2.metrics["gauss_points"] == q2.num_points
    # the timer taxonomy recorded the hot phases (reference label parity,
    # SURVEY.md §5)
    for label in ["qmap: material integration", "solver: Newton solve"]:
        count, total = timing(label)
        assert count > 0 and total > 0


def test_adaptive_cutback_fefp_envelope_guard():
    """FeFp with an oversized first load step: wild Newton trials can leave the
    batched fast path's Gregory-series envelope (NaN-poisoned by design) — the
    line search + adaptive cutback must recover and finish."""
    from dolfinx_materials_tpu.fem.forms import deformation_gradient_2d
    from dolfinx_materials_tpu.models import FeFpJ2Plasticity

    mesh = create_unit_square(3, 3, "quad")
    V = FunctionSpace(mesh, 1, (2,))
    mat = Material(
        FeFpJ2Plasticity(
            LinearElasticIsotropic(E, 0.3), VoceHardening(sig0, 500.0, 1e2)
        )
    )
    assert mat._fast_update is not None
    qmap = QuadratureMap(V, 2, mat)
    qmap.register_gradient("F", deformation_gradient_2d())
    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0), 0)
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0), 1)
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1), 0)
    bc = DirichletBC(right, 0.0)
    problem = NonlinearMaterialProblem(
        qmap,
        Function(V),
        bcs=[DirichletBC(left, 0.0), DirichletBC(bottom, 0.0), bc],
        options={"ksp_type": "lu", "max_it": 8},
    )
    # 12% stretch in (at most) a couple of adaptive steps: far past yield
    accepted = solve_adaptive(problem, bc.set, 0.12, nsteps0=2)
    assert len(accepted) >= 2 and np.isclose(accepted[-1], 0.12)
    p = np.asarray(mat.data_manager.s0["p"])
    assert p.max() > 0.02 and np.isfinite(p).all()
