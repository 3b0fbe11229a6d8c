"""Exact conic return mapping vs independent golden data (VERDICT r2 item 6).

Golden file: tests/golden/conic_projection.csv — produced by an INDEPENDENT
principal-space SLSQP QP solve with exact active-set polish (cvxpy, the
reference's solver, is not in this environment; provenance in
tests/golden/README.md). The bar: vertex-state stress error <= 1e-8.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dolfinx_materials_tpu.models.conic_exact import (
    HosfordExact,
    L1RankineExact,
    RankineExact,
)

E, nu, ft, fc = 30e3, 0.2, 3.0, 30.0
SIG0_HOSFORD, A_HOSFORD = 3.0, 10.0


@pytest.fixture(scope="module")
def golden():
    path = os.path.join(os.path.dirname(__file__), "golden", "conic_projection.csv")
    return np.loadtxt(path, delimiter=",")


@pytest.mark.parametrize("kind", [0, 1])
def test_exact_projection_vs_golden(golden, kind):
    mat = (RankineExact if kind == 0 else L1RankineExact)(E, nu, ft, fc)
    rows = golden[golden[:, 0] == kind]
    trials = jnp.asarray(rows[:, 1:4])
    ref = rows[:, 4:7]
    got = np.asarray(jax.vmap(mat.project)(trials))
    err = np.abs(got - ref).max()
    assert err <= 1e-8 * max(ft, fc), f"max projection error {err:.3e}"


def test_hosford_exact_vs_golden(golden):
    """VERDICT r4 item 5: the last smoothed conic surface made exact. Golden
    rows (kind=2) come from an independent SLSQP + MINPACK-KKT solve in FULL
    Mandel space (tests/golden/README.md)."""
    mat = HosfordExact(E, nu, SIG0_HOSFORD, A_HOSFORD)
    rows = golden[golden[:, 0] == 2]
    assert len(rows) >= 20
    got = np.asarray(jax.vmap(mat.project)(jnp.asarray(rows[:, 1:4])))
    err = np.abs(got - rows[:, 4:7]).max()
    assert err <= 1e-8 * SIG0_HOSFORD, f"max projection error {err:.3e}"


def test_hosford_feasibility_and_interior():
    mat = HosfordExact(E, nu, SIG0_HOSFORD, A_HOSFORD)
    rng = np.random.default_rng(5)
    trials = jnp.asarray(rng.normal(size=(256, 3)) * 50.0)
    sig = np.asarray(jax.vmap(mat.project)(trials))
    T = sig[:, 0] + sig[:, 1]
    R = np.hypot(0.5 * (sig[:, 0] - sig[:, 1]), sig[:, 2] / np.sqrt(2))
    l1, l2 = 0.5 * T + R, 0.5 * T - R
    gval = (
        np.abs(l1 - l2) ** A_HOSFORD
        + np.abs(l1) ** A_HOSFORD
        + np.abs(l2) ** A_HOSFORD
    ) / SIG0_HOSFORD**A_HOSFORD - 2.0
    assert (gval <= 1e-8).all()
    s_in = jnp.array([0.5, -1.0, 0.3])
    np.testing.assert_allclose(
        np.asarray(mat.project(s_in)), np.asarray(s_in), atol=1e-12
    )


@pytest.mark.slow
def test_hosford_consistent_tangent_fd():
    mat = HosfordExact(E, nu, SIG0_HOSFORD, A_HOSFORD)
    state = mat.init_state()

    def f(e):
        return mat.constitutive_update({"Strain": e}, state, 0.0)[0]["Stress"]

    eps = jnp.array([4e-4, 1e-4, 2e-4])  # plastic
    J = np.asarray(jax.jacfwd(f)(eps))
    h = 1e-7
    Jfd = np.stack(
        [
            (np.asarray(f(eps + h * jnp.eye(3)[i]))
             - np.asarray(f(eps - h * jnp.eye(3)[i]))) / (2 * h)
            for i in range(3)
        ],
        axis=1,
    )
    assert np.abs(J - Jfd).max() / np.abs(Jfd).max() < 1e-5


def test_vertex_exactness():
    """Biaxial tension far outside the surface must land EXACTLY on the
    (ft, ft) Rankine vertex — the state the smoothed path misses by O(smooth)."""
    mat = RankineExact(E, nu, ft, fc)
    sig = np.asarray(mat.project(jnp.array([50.0, 50.0, 0.0])))
    np.testing.assert_allclose(sig, [ft, ft, 0.0], atol=1e-10)
    # compression vertex
    sig = np.asarray(mat.project(jnp.array([-500.0, -500.0, 0.0])))
    np.testing.assert_allclose(sig, [-fc, -fc, 0.0], atol=1e-9)


def test_interior_untouched():
    mat = L1RankineExact(E, nu, ft, fc)
    s = jnp.array([0.5, -1.0, 0.3])
    np.testing.assert_allclose(np.asarray(mat.project(s)), np.asarray(s), atol=1e-12)


def test_feasibility_always():
    """Projected states satisfy every constraint for random extreme trials."""
    rng = np.random.default_rng(3)
    trials = jnp.asarray(rng.normal(size=(256, 3)) * 100.0)
    for Mat in (RankineExact, L1RankineExact):
        mat = Mat(E, nu, ft, fc)
        sig = np.asarray(jax.vmap(mat.project)(trials))
        T = sig[:, 0] + sig[:, 1]
        R = np.hypot(0.5 * (sig[:, 0] - sig[:, 1]), sig[:, 2] / np.sqrt(2))
        l1, l2 = 0.5 * T + R, 0.5 * T - R
        tol = 1e-8 * fc
        if Mat is RankineExact:
            assert (l1 <= ft + tol).all() and (l2 >= -fc - tol).all()
        else:
            assert (T <= ft + tol).all() and (T >= -fc - tol).all()
            assert (l1 / ft - l2 / fc <= 1 + 1e-9).all()


def test_consistent_tangent_fd():
    """AD tangent of the exact projection matches finite differences away
    from surface kinks (the capability the reference's cvxpy path lacks)."""
    mat = RankineExact(E, nu, ft, fc, tangent="consistent")
    state = mat.init_state()
    eps = jnp.array([4e-4, 1e-4, 2e-4])  # plastic, single active face

    def f(e):
        out, _ = mat.constitutive_update({"Strain": e}, state, 0.0)
        return out["Stress"]

    Ct = jax.jacfwd(f)(eps)
    h = 1e-6
    fd = np.stack(
        [(np.asarray(f(eps + h * jnp.eye(3)[i])) - np.asarray(f(eps - h * jnp.eye(3)[i]))) / (2 * h) for i in range(3)],
        axis=1,
    )
    np.testing.assert_allclose(np.asarray(Ct), fd, rtol=1e-4, atol=1e-2)


def test_elastic_tangent_mode():
    """tangent='elastic' reproduces the reference's C-as-tangent contract
    (cvxpy_materials.py:51) while the VALUE stays the exact projection."""
    mat = RankineExact(E, nu, ft, fc, tangent="elastic")
    state = mat.init_state()
    eps = jnp.array([4e-4, 4e-4, 0.0])

    def f(e):
        out, _ = mat.constitutive_update({"Strain": e}, state, 0.0)
        return out["Stress"]

    Ct = np.asarray(jax.jacfwd(f)(eps))
    np.testing.assert_allclose(Ct, mat.C, rtol=1e-10)
    sig = np.asarray(f(eps))
    np.testing.assert_allclose(sig, [ft, ft, 0.0], atol=1e-8)


def test_stress_path_smoothed_vs_exact():
    """Driving a radial strain path: the exact map agrees with the round-2
    smoothed surface away from vertices and is sharper AT the vertex."""
    from dolfinx_materials_tpu.models.conic import rankine_norm

    mat = RankineExact(E, nu, ft, fc)
    state = mat.init_state()
    # biaxial path into the (ft, ft) vertex
    for s in np.linspace(0, 6e-4, 7)[1:]:
        eps = jnp.array([s, s, 0.0])
        out, state = mat.constitutive_update({"Strain": eps}, state, 0.0)
    sig = np.asarray(out["Stress"])
    np.testing.assert_allclose(sig[:2], [ft, ft], atol=1e-9)


def test_plane_stress_von_mises_exact():
    """Exact plane-stress von Mises projection (secular-equation solve in the
    generalized eigenbasis) vs an inline independent SLSQP QP, plus
    feasibility and interior identity."""
    from scipy.optimize import minimize

    from dolfinx_materials_tpu.models.conic_exact import PlaneStressVonMisesExact

    sig0 = 5.0
    mat = PlaneStressVonMisesExact(E, nu, sig0)
    Q, C = mat.Q, mat.C
    Cinv = np.linalg.inv(C)
    rng = np.random.default_rng(5)
    trials = np.concatenate(
        [rng.normal(size=(24, 3)) * s for s in (2.0, 10.0, 50.0)]
    )

    def slsqp(t):
        cons = [{"type": "ineq", "fun": lambda s: sig0**2 - s @ Q @ s}]

        def obj(s):
            d = s - t
            return 0.5 * d @ Cinv @ d

        best = None
        for x0 in (np.zeros(3), t * 0.2):
            r = minimize(obj, x0, constraints=cons, method="SLSQP",
                         options={"maxiter": 800, "ftol": 1e-18})
            if (t @ Q @ t <= sig0**2) or (abs(r.x @ Q @ r.x - sig0**2) < 1e-6):
                if best is None or r.fun < best[1]:
                    best = (r.x, r.fun)
        return best[0]

    got = np.asarray(jax.vmap(mat.project)(jnp.asarray(trials)))
    for t, g in zip(trials, got):
        # cross-solver agreement at SLSQP's own accuracy (~1e-6 in x)
        ref = slsqp(t)
        np.testing.assert_allclose(g, ref, rtol=1e-5, atol=1e-5 * sig0)
        assert g @ Q @ g <= sig0**2 * (1 + 1e-9)
        # KKT at machine precision (our solve is the sharper one): on the
        # surface (or interior), and C^{-1}(g - t) anti-parallel to Q g
        if t @ Q @ t > sig0**2:
            assert abs(g @ Q @ g - sig0**2) < 1e-9 * sig0**2
            r1 = Cinv @ (g - t)
            r2 = Q @ g
            cross = np.linalg.norm(
                r1 - (r1 @ r2) / max(r2 @ r2, 1e-300) * r2
            )
            assert cross < 1e-9 * max(1.0, np.linalg.norm(r1))
    # interior trials untouched
    t_in = jnp.array([0.5, -0.3, 0.2])
    np.testing.assert_allclose(
        np.asarray(mat.project(t_in)), np.asarray(t_in), atol=1e-12
    )
    # consistent tangent == elastic C in the elastic regime
    state = mat.init_state()

    def f(e):
        out, _ = mat.constitutive_update({"Strain": e}, state, 0.0)
        return out["Stress"]

    Ct = np.asarray(jax.jacfwd(f)(jnp.array([1e-6, 0.0, 0.0])))
    np.testing.assert_allclose(Ct, C, rtol=1e-8)


def test_exact_conic_in_fem_solve():
    """The exact conic behaviors drive a full 2D plane-stress FEM solve
    (gradient Strain (3,) via plane_stress_strain_3) — uniaxial tension of a
    Rankine material caps the stress at ft."""
    from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
    from dolfinx_materials_tpu.fem import (
        DirichletBC,
        Function,
        FunctionSpace,
        create_unit_square,
        locate_dofs_geometrical,
    )
    from dolfinx_materials_tpu.fem.forms import plane_stress_strain_3
    from dolfinx_materials_tpu.models import RankineExact

    mat = Material(RankineExact(E, nu, ft, fc))
    mesh = create_unit_square(4, 4, "quad")
    V = FunctionSpace(mesh, 1, (2,))
    qmap = QuadratureMap(V, 2, mat)
    qmap.register_gradient("Strain", plane_stress_strain_3())
    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0), 0)
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0), 1)
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1), 0)
    pull = DirichletBC(right, 0.0)
    prob = NonlinearMaterialProblem(
        qmap,
        Function(V),
        bcs=[DirichletBC(left, 0.0), DirichletBC(bottom, 0.0), pull],
        options={"ksp_type": "lu"},
    )
    # drive past yield in steps (incremental state: Strain/Stress committed)
    for exx in np.linspace(0.0, 4 * ft / E, 5)[1:]:
        pull.set(exx)
        conv, _ = prob.solve()
        assert conv
    sig = np.asarray(mat.data_manager.s0["Stress"])
    # every Gauss point capped at the tensile strength, none above
    assert sig[:, 0].max() <= ft * (1 + 1e-8)
    np.testing.assert_allclose(sig[:, 0], ft, rtol=1e-6)
