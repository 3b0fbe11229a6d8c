"""Generalized fused sharded Newton step (VERDICT r2 item 3): thermal
problems (ESV + non-default residual terms), multi-material cell subsets,
rotations, and unstructured (gmsh-class) meshes — all matching the host
solver on the virtual 8-device mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_rectangle,
    create_unit_square,
    locate_dofs_geometrical,
    reorder_mesh,
)
from dolfinx_materials_tpu.fem.bc import combine_bcs
from dolfinx_materials_tpu.fem.forms import (
    mandel_strain_2d,
    scalar_gradient,
    scalar_value,
)
from dolfinx_materials_tpu.models import (
    LinearElasticIsotropic,
    LinearHardening,
    NonlinearHeatTransfer,
    VoceHardening,
    vonMisesIsotropicHardening,
)
from dolfinx_materials_tpu.parallel import (
    device_mesh,
    make_sharded_newton_step_general,
)

E, nu, sig0 = 70e3, 0.3, 350.0


def mech_bcs(V, exx):
    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0), 0)
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0), 1)
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1), 0)
    return [DirichletBC(left, 0.0), DirichletBC(bottom, 0.0), DirichletBC(right, exx)]


def test_general_step_thermal_esv():
    """Stationary nonlinear conduction: TemperatureGradient gradient + the
    Temperature ESV (an expression of u) + a non-default residual term —
    the signature the specialized fused step cannot express."""
    cmesh = device_mesh(8)
    A, B = 0.0375, 2.165e-4
    T0, T1 = 300.0, 800.0
    mesh = create_rectangle((0, 0), (1.0, 0.2), (10, 3), "quad")
    V = FunctionSpace(mesh, 1, ())

    def build():
        mat = Material(NonlinearHeatTransfer(A=A, B=B, dim=2))
        qmap = QuadratureMap(V, 2, mat)
        qmap.register_gradient("TemperatureGradient", scalar_gradient())
        qmap.register_external_state_variable("Temperature", scalar_value())
        left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0.0))
        right = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1.0))
        bcs = [DirichletBC(left, T0), DirichletBC(right, T1)]
        T = Function(V)
        T.x[:] = T0
        prob = NonlinearMaterialProblem(
            qmap,
            T,
            bcs=bcs,
            residual_terms=[[("HeatFlux", scalar_gradient())]],
            options={"ksp_type": "lu", "atol": 1e-8},
        )
        return mat, qmap, bcs, T, prob

    mat1, qmap1, bcs1, T1f, prob1 = build()
    conv, _ = prob1.solve()
    assert conv

    mat2, qmap2, bcs2, T2f, prob2 = build()
    step, _ = make_sharded_newton_step_general(
        prob2, cmesh, n_newton=12, n_cg=200
    )
    mask, vals = combine_bcs(bcs2, V.num_dofs)
    u0 = np.full(V.num_dofs, T0)
    u0[mask] = vals[mask]
    u_sh, states, rn = step(
        jnp.asarray(u0), [mat2.data_manager.s0.internal], mask, vals, 0.0
    )
    assert float(rn) < 1e-8 * abs(T1)
    np.testing.assert_allclose(np.asarray(u_sh), T1f.x, rtol=1e-8, atol=1e-8)


def test_general_step_two_materials():
    """Two cell-subset qmaps (different hardening) sharded over 8 devices
    match the host two-material solve, including each subset's plastic state."""
    cmesh = device_mesh(8)
    mesh = create_unit_square(5, 5, "quad")
    V = FunctionSpace(mesh, 1, (2,))
    exx = 3 * sig0 / E
    cells = np.arange(mesh.num_cells)
    subsets = [cells[cells % 2 == 0], cells[cells % 2 == 1]]

    def build():
        mats, qmaps = [], []
        for sub, hard in zip(
            subsets,
            (LinearHardening(sig0, 1000.0), VoceHardening(sig0, 500.0, 1e3)),
        ):
            m = Material(
                vonMisesIsotropicHardening(LinearElasticIsotropic(E, nu), hard)
            )
            q = QuadratureMap(V, 2, m, cells=sub)
            q.register_gradient("Strain", mandel_strain_2d())
            mats.append(m)
            qmaps.append(q)
        bcs = mech_bcs(V, exx)
        prob = NonlinearMaterialProblem(
            qmaps, Function(V), bcs=bcs, options={"ksp_type": "lu"}
        )
        return mats, qmaps, bcs, prob

    mats1, qmaps1, bcs1, prob1 = build()
    conv, _ = prob1.solve()
    assert conv
    u_ref = prob1.u.x

    mats2, qmaps2, bcs2, prob2 = build()
    step, _ = make_sharded_newton_step_general(
        prob2, cmesh, n_newton=14, n_cg=300
    )
    mask, vals = combine_bcs(bcs2, V.num_dofs)
    u_sh, states, rn = step(
        jnp.zeros(V.num_dofs),
        [m.data_manager.s0.internal for m in mats2],
        mask,
        vals,
        0.0,
    )
    assert float(rn) < 1e-8 * E
    np.testing.assert_allclose(np.asarray(u_sh), u_ref, rtol=1e-6, atol=1e-10)
    # per-subset plastic states match the host solve, trimmed to real points
    for q1, m1, st in zip(qmaps1, mats1, states):
        p_ref = np.asarray(m1.data_manager.s1["p"]).ravel()
        p_sh = np.asarray(st["p"]).ravel()
        assert p_sh.shape == p_ref.shape
        np.testing.assert_allclose(p_sh, p_ref, rtol=1e-6, atol=1e-12)
    assert max(np.asarray(st["p"]).max() for st in states) > 1e-4


def test_general_step_rotated_frame():
    """Constant material-frame rotation (the MGIS rotation path) flows
    through the fused step and matches the host solver."""
    cmesh = device_mesh(8)
    mesh = create_unit_square(4, 4, "quad")
    V = FunctionSpace(mesh, 1, (2,))
    exx = 2 * sig0 / E
    angle = 0.3
    c, s = np.cos(angle), np.sin(angle)
    R = jnp.asarray([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])

    def build():
        m = Material(
            vonMisesIsotropicHardening(
                LinearElasticIsotropic(E, nu), LinearHardening(sig0, 1000.0)
            )
        )
        m.rotation_matrix = R
        q = QuadratureMap(V, 2, m)
        q.register_gradient("Strain", mandel_strain_2d())
        bcs = mech_bcs(V, exx)
        prob = NonlinearMaterialProblem(
            q, Function(V), bcs=bcs, options={"ksp_type": "lu"}
        )
        return m, q, bcs, prob

    m1, q1, bcs1, prob1 = build()
    conv, _ = prob1.solve()
    assert conv

    m2, q2, bcs2, prob2 = build()
    step, _ = make_sharded_newton_step_general(prob2, cmesh, n_newton=12, n_cg=200)
    mask, vals = combine_bcs(bcs2, V.num_dofs)
    u_sh, states, rn = step(
        jnp.zeros(V.num_dofs), [m2.data_manager.s0.internal], mask, vals, 0.0
    )
    assert float(rn) < 1e-8 * E
    np.testing.assert_allclose(np.asarray(u_sh), prob1.u.x, rtol=1e-6, atol=1e-10)


def test_general_step_unstructured_mesh():
    """The fused step runs on an UNSTRUCTURED (Delaunay, gmsh-class) mesh —
    no stencil anywhere — and matches the host LU solve (VERDICT r2 item 2)."""
    from scipy.spatial import Delaunay

    from dolfinx_materials_tpu.fem.mesh import Mesh

    cmesh = device_mesh(8)
    rng = np.random.default_rng(0)
    g = 7
    xx, yy = np.meshgrid(np.arange(g + 1), np.arange(g + 1))
    pts = np.stack([xx, yy], -1).reshape(-1, 2) / g
    pts += np.where(
        ((pts > 0) & (pts < 1)), rng.uniform(-0.2 / g, 0.2 / g, pts.shape), 0.0
    )
    mesh = reorder_mesh(Mesh(pts, Delaunay(pts).simplices.astype(np.int32), "triangle"))
    V = FunctionSpace(mesh, 1, (2,))
    exx = 2 * sig0 / E

    def build():
        m = Material(
            vonMisesIsotropicHardening(
                LinearElasticIsotropic(E, nu), VoceHardening(sig0, 500.0, 1e3)
            )
        )
        q = QuadratureMap(V, 2, m)
        q.register_gradient("Strain", mandel_strain_2d())
        bcs = mech_bcs(V, exx)
        prob = NonlinearMaterialProblem(
            q, Function(V), bcs=bcs, options={"ksp_type": "lu"}
        )
        return m, q, bcs, prob

    m1, q1, bcs1, prob1 = build()
    conv, _ = prob1.solve()
    assert conv

    m2, q2, bcs2, prob2 = build()
    step, _ = make_sharded_newton_step_general(prob2, cmesh, n_newton=14, n_cg=300)
    mask, vals = combine_bcs(bcs2, V.num_dofs)
    u_sh, states, rn = step(
        jnp.zeros(V.num_dofs), [m2.data_manager.s0.internal], mask, vals, 0.0
    )
    assert float(rn) < 1e-8 * E
    np.testing.assert_allclose(np.asarray(u_sh), prob1.u.x, rtol=1e-5, atol=1e-9)
    p_sh = np.asarray(states[0]["p"]).ravel()
    p_ref = np.asarray(m1.data_manager.s1["p"]).ravel()
    np.testing.assert_allclose(p_sh, p_ref, rtol=1e-5, atol=1e-11)
    assert p_ref.max() > 1e-4


@pytest.mark.slow
def test_specialized_step_banded_unstructured():
    """The SPECIALIZED fused step (make_sharded_newton_step) routes its
    per-CG gather/assembly through the banded lane-gather engine on
    unstructured meshes (every device runs the full banded pass, element
    work stays sharded — the stencil pattern) and matches host LU."""
    from scipy.spatial import Delaunay

    from dolfinx_materials_tpu.fem.mesh import Mesh
    from dolfinx_materials_tpu.parallel import make_sharded_newton_step

    cmesh = device_mesh(8)
    rng = np.random.default_rng(1)
    g = 28  # ~1600 cells: above the banded-plan threshold
    xx, yy = np.meshgrid(np.arange(g + 1), np.arange(g + 1))
    pts = np.stack([xx, yy], -1).reshape(-1, 2) / g
    pts += np.where(
        ((pts > 0) & (pts < 1)), rng.uniform(-0.2 / g, 0.2 / g, pts.shape), 0.0
    )
    mesh = reorder_mesh(Mesh(pts, Delaunay(pts).simplices.astype(np.int32), "triangle"))
    V = FunctionSpace(mesh, 1, (2,))
    exx = 2 * sig0 / E

    def build():
        m = Material(
            vonMisesIsotropicHardening(
                LinearElasticIsotropic(E, nu), VoceHardening(sig0, 500.0, 1e3)
            )
        )
        q = QuadratureMap(V, 2, m)
        q.register_gradient("Strain", mandel_strain_2d())
        bcs = mech_bcs(V, exx)
        prob = NonlinearMaterialProblem(
            q, Function(V), bcs=bcs, options={"ksp_type": "lu"}
        )
        return m, q, bcs, prob

    m1, q1, bcs1, prob1 = build()
    conv, _ = prob1.solve()
    assert conv

    m2, q2, bcs2, prob2 = build()
    assert q2.domain._banded is not None, "banded plans must build here"
    step, _ = make_sharded_newton_step(
        q2, prob2, cmesh, n_newton=14, n_cg=400, pc="jacobi"
    )
    mask, vals = combine_bcs(bcs2, V.num_dofs)
    u_sh, states, rn = step(
        jnp.zeros(V.num_dofs), m2.data_manager.s0.internal, mask, vals, 0.0
    )
    assert float(rn) < 1e-8 * E
    np.testing.assert_allclose(np.asarray(u_sh), prob1.u.x, rtol=1e-5, atol=1e-9)


def test_specialized_step_two_level_unstructured():
    """The frozen two-level coarse correction now builds on UNSTRUCTURED
    meshes too (coordinate-box node aggregates, segment-sum restriction /
    table-gather prolongation). With the coarse space active the same
    problem converges in a 140-CG budget where plain Jacobi needs ~400
    (test above) — and still matches host LU."""
    from scipy.spatial import Delaunay

    from dolfinx_materials_tpu.fem.mesh import Mesh
    from dolfinx_materials_tpu.parallel import make_sharded_newton_step

    cmesh = device_mesh(8)
    rng = np.random.default_rng(1)
    g = 28
    xx, yy = np.meshgrid(np.arange(g + 1), np.arange(g + 1))
    pts = np.stack([xx, yy], -1).reshape(-1, 2) / g
    pts += np.where(
        ((pts > 0) & (pts < 1)), rng.uniform(-0.2 / g, 0.2 / g, pts.shape), 0.0
    )
    mesh = reorder_mesh(Mesh(pts, Delaunay(pts).simplices.astype(np.int32), "triangle"))
    V = FunctionSpace(mesh, 1, (2,))
    exx = 2 * sig0 / E

    def build():
        m = Material(
            vonMisesIsotropicHardening(
                LinearElasticIsotropic(E, nu), VoceHardening(sig0, 500.0, 1e3)
            )
        )
        q = QuadratureMap(V, 2, m)
        q.register_gradient("Strain", mandel_strain_2d())
        bcs = mech_bcs(V, exx)
        prob = NonlinearMaterialProblem(
            q, Function(V), bcs=bcs, options={"ksp_type": "lu"}
        )
        return m, q, bcs, prob

    m1, q1, bcs1, prob1 = build()
    conv, _ = prob1.solve()
    assert conv

    m2, q2, bcs2, prob2 = build()
    step, _ = make_sharded_newton_step(
        q2, prob2, cmesh, n_newton=14, n_cg=140, pc="two_level"
    )
    mask, vals = combine_bcs(bcs2, V.num_dofs)
    u_sh, states, rn = step(
        jnp.zeros(V.num_dofs), m2.data_manager.s0.internal, mask, vals, 0.0
    )
    assert float(rn) < 1e-8 * E
    np.testing.assert_allclose(np.asarray(u_sh), prob1.u.x, rtol=1e-5, atol=1e-9)


@pytest.mark.slow
def test_specialized_step_p2_tet_banded():
    """P2 TETRAHEDRA through the specialized fused step: the spatial node
    renumbering (fem/space.py:_renumber_nodes) must let the banded cell+asm
    plans build on the degree-2 dofmap (canonical vertex/edge bands defeat
    the windows otherwise), and the banded gathers + coordinate-box
    two-level PC must reproduce the host LU solve. This is the CI guard on
    the reference-protocol discretization (P2 tets) the Ogden tet benchmark
    runs on TPU."""
    from dolfinx_materials_tpu.fem import create_unit_cube
    from dolfinx_materials_tpu.fem.forms import mandel_strain_3d
    from dolfinx_materials_tpu.parallel import make_sharded_newton_step

    cmesh = device_mesh(8)
    mesh = create_unit_cube(4, 4, 4, "tetrahedron")
    V = FunctionSpace(mesh, 2, (3,))
    exx = 1e-3

    def build():
        m = Material(LinearElasticIsotropic(E, nu))
        q = QuadratureMap(V, 4, m)
        q.register_gradient("Strain", mandel_strain_3d())
        # 3D uniaxial: symmetry planes pin ALL rigid modes (mech_bcs is 2D
        # and would leave z-translation free -> singular K)
        bcs = mech_bcs(V, exx) + [
            DirichletBC(
                locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 2], 0), 2),
                0.0,
            )
        ]
        prob = NonlinearMaterialProblem(
            q, Function(V), bcs=bcs, options={"ksp_type": "lu"}
        )
        return m, q, bcs, prob

    m1, q1, bcs1, prob1 = build()
    conv, _ = prob1.solve()
    assert conv

    m2, q2, bcs2, prob2 = build()
    assert V.node_renum is not None, "P2 renumbering must engage here"
    b = q2.domain._banded
    assert b is not None and b["cell"] is not None and b["asm"] is not None, (
        "banded cell+asm plans must build on the renumbered P2 tet dofmap"
    )
    step, _ = make_sharded_newton_step(
        q2, prob2, cmesh, n_newton=4, n_cg=200, pc="two_level"
    )
    mask, vals = combine_bcs(bcs2, V.num_dofs)
    u_sh, states, rn = step(
        jnp.zeros(V.num_dofs), m2.data_manager.s0.internal, mask, vals, 0.0
    )
    assert float(rn) < 1e-7 * E
    np.testing.assert_allclose(np.asarray(u_sh), prob1.u.x, rtol=1e-5, atol=1e-9)


@pytest.mark.slow
def test_general_step_banded_unstructured():
    """The GENERAL fused step now routes per-qmap gathers/assembly through
    the banded lane-gather engine when the domain's plans built (previously
    scalar dofmap gathers/scatters — the specialized step's fast engines
    never reached the general builder). Same Delaunay mesh as the
    specialized banded test; parity vs host LU."""
    from scipy.spatial import Delaunay

    from dolfinx_materials_tpu.fem.mesh import Mesh

    cmesh = device_mesh(8)
    rng = np.random.default_rng(1)
    g = 28
    xx, yy = np.meshgrid(np.arange(g + 1), np.arange(g + 1))
    pts = np.stack([xx, yy], -1).reshape(-1, 2) / g
    pts += np.where(
        ((pts > 0) & (pts < 1)), rng.uniform(-0.2 / g, 0.2 / g, pts.shape), 0.0
    )
    mesh = reorder_mesh(Mesh(pts, Delaunay(pts).simplices.astype(np.int32), "triangle"))
    V = FunctionSpace(mesh, 1, (2,))
    exx = 2 * sig0 / E

    def build():
        m = Material(
            vonMisesIsotropicHardening(
                LinearElasticIsotropic(E, nu), VoceHardening(sig0, 500.0, 1e3)
            )
        )
        q = QuadratureMap(V, 2, m)
        q.register_gradient("Strain", mandel_strain_2d())
        bcs = mech_bcs(V, exx)
        prob = NonlinearMaterialProblem(
            q, Function(V), bcs=bcs, options={"ksp_type": "lu"}
        )
        return m, q, bcs, prob

    m1, q1, bcs1, prob1 = build()
    conv, _ = prob1.solve()
    assert conv

    m2, q2, bcs2, prob2 = build()
    assert q2.domain._banded is not None, "banded plans must build here"
    step, _ = make_sharded_newton_step_general(prob2, cmesh, n_newton=14, n_cg=400)
    mask, vals = combine_bcs(bcs2, V.num_dofs)
    u_sh, states, rn = step(
        jnp.zeros(V.num_dofs), [m2.data_manager.s0.internal], mask, vals, 0.0
    )
    assert float(rn) < 1e-8 * E
    np.testing.assert_allclose(np.asarray(u_sh), prob1.u.x, rtol=1e-5, atol=1e-9)
    p_sh = np.asarray(states[0]["p"]).ravel()
    p_ref = np.asarray(m1.data_manager.s1["p"]).ravel()
    np.testing.assert_allclose(p_sh, p_ref, rtol=1e-5, atol=1e-11)
    assert p_ref.max() > 1e-4


@pytest.mark.slow
def test_general_step_transient_phase_change():
    """TRANSIENT theta-scheme through the general fused step: the Enthalpy
    ISV appears in the residual (field = internal state variable), the
    previous-step enthalpy enters as an external force, and term scales are
    traced — one time step must match the host solver."""
    from dolfinx_materials_tpu.models import PhaseChangeHeatTransfer

    cmesh = device_mesh(8)
    beh_probe = PhaseChangeHeatTransfer(Tsmooth=5.0, dim=2)
    Tm = beh_probe.Tm
    L, nx = 0.1, 12
    mesh = create_rectangle((0, 0), (L, L / nx), (nx, 1), "quad")
    V = FunctionSpace(mesh, 1, ())
    dtv = 2.0

    def build():
        beh = PhaseChangeHeatTransfer(Tsmooth=5.0, dim=2)
        mat = Material(beh)
        qmap = QuadratureMap(V, 2, mat)
        qmap.register_gradient("TemperatureGradient", scalar_gradient())
        qmap.register_external_state_variable("Temperature", scalar_value())
        T = Function(V)
        T.x[:] = Tm - 50.0
        left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0.0))
        bcs = [DirichletBC(left, Tm + 150.0)]
        prob = NonlinearMaterialProblem(
            qmap,
            T,
            bcs=bcs,
            residual_terms=[
                [("Enthalpy", scalar_value()),
                 ("HeatFlux", scalar_gradient(), lambda: -dtv)]
            ],
            options={"ksp_type": "lu", "atol": 1e-4, "max_it": 60},
        )
        qmap.update(jnp.asarray(T.x))
        qmap.advance()
        ext = qmap.domain.make_residual([scalar_value()])
        f_ext = np.asarray(
            ext(jnp.asarray(T.x), [mat.data_manager.s0["Enthalpy"]])
        )
        return mat, qmap, bcs, T, prob, f_ext

    # host reference: one transient step
    mat1, qmap1, bcs1, T1, prob1, f1 = build()
    prob1.external_force = f1
    conv, _ = prob1.solve()
    assert conv

    # fused general step, same step
    mat2, qmap2, bcs2, T2, prob2, f2 = build()
    step, _ = make_sharded_newton_step_general(
        prob2, cmesh, n_newton=25, n_cg=300, atol=1e-4
    )
    mask, vals = combine_bcs(bcs2, V.num_dofs)
    u0 = np.array(T2.x)
    u0[mask] = vals[mask]
    u_sh, states, rn = step(
        jnp.asarray(u0),
        [mat2.data_manager.s0.internal],
        mask,
        vals,
        dtv,
        f_ext=jnp.asarray(f2),
    )
    assert float(rn) < 2e-4
    np.testing.assert_allclose(np.asarray(u_sh), T1.x, rtol=1e-5, atol=1e-3)
    # the front actually moved (some nodes melted)
    assert (np.asarray(u_sh) > Tm).sum() >= 1


@pytest.mark.slow
def test_blocked_step_thermomechanical():
    """The fused BLOCKED step: stiffly two-way-coupled thermo-mechanics
    (cross-field tangent blocks both ways) matches the host
    BlockedNonlinearProblem LU solve on the 8-device mesh."""
    import sys as _sys
    import pathlib as _pl

    _sys.path.insert(0, str(_pl.Path(__file__).parent))
    from test_blocked import build, couplings

    from dolfinx_materials_tpu.solvers import BlockedNonlinearProblem
    from dolfinx_materials_tpu.parallel import make_sharded_blocked_step

    cmesh = device_mesh(8)

    # host reference
    heat1, mech1, qT1, qu1, T1, u1, mat_u1, mat_T1 = build()
    blocked1 = BlockedNonlinearProblem(
        [heat1, mech1], couplings(heat1, mech1, qT1, qu1),
        options={"ksp_type": "lu"},
    )
    conv, _ = blocked1.solve()
    assert conv
    z_ref = np.concatenate([T1.x, u1.x])

    # fused sharded blocked step
    heat2, mech2, qT2, qu2, T2, u2, mat_u2, mat_T2 = build()
    blocked2 = BlockedNonlinearProblem(
        [heat2, mech2], couplings(heat2, mech2, qT2, qu2)
    )
    step, _ = make_sharded_blocked_step(
        blocked2, cmesh, n_newton=16, n_cg=400
    )
    mask, vals = blocked2._masks()
    z0 = np.concatenate([T2.x, u2.x])
    z0[np.asarray(mask)] = np.asarray(vals)[np.asarray(mask)]
    states0 = [
        qi.material.data_manager.s0.internal for qi in (qT2, qu2)
    ]
    z_sh, states, rn = step(jnp.asarray(z0), states0, mask, vals, 0.0)
    scale = float(np.abs(z_ref).max())
    assert float(rn) < 1e-7 * 70e3
    np.testing.assert_allclose(
        np.asarray(z_sh), z_ref, rtol=1e-6, atol=1e-8 * max(1.0, scale)
    )


@pytest.mark.slow
def test_blocked_step_two_level_beats_jacobi():
    """The blocked step's TWO-LEVEL + node-block preconditioning (round-3
    roadmap's last fused-step gap): on a 24x24 stiffly-coupled
    thermo-mechanical problem at a 20-iteration BiCGStab budget, the
    monolithic coarse correction converges to the f64 floor where scalar
    Jacobi stalls ~5 orders of magnitude higher — and the preconditioned
    answer matches the host LU solve. (Budget 20, not 30: at 30 Jacobi
    nearly converges on this toy problem and the comparison is marginal.)"""
    import sys as _sys
    import pathlib as _pl

    _sys.path.insert(0, str(_pl.Path(__file__).parent))
    from test_blocked import build, couplings

    from dolfinx_materials_tpu.solvers import BlockedNonlinearProblem
    from dolfinx_materials_tpu.parallel import make_sharded_blocked_step

    cmesh = device_mesh(8)
    N = 24

    def run(pc, smoother):
        heat, mech, qT, qu, T, u, _, _ = build(N)
        blocked = BlockedNonlinearProblem(
            [heat, mech], couplings(heat, mech, qT, qu)
        )
        step, _ = make_sharded_blocked_step(
            blocked, cmesh, n_newton=8, n_cg=20, pc=pc, smoother=smoother
        )
        mask, vals = blocked._masks()
        z0 = np.concatenate([T.x, u.x])
        z0[np.asarray(mask)] = np.asarray(vals)[np.asarray(mask)]
        states0 = [q.material.data_manager.s0.internal for q in (qT, qu)]
        z, _, rn = step(jnp.asarray(z0), states0, mask, vals, 0.0)
        return np.asarray(z), float(rn)

    z_tl, rn_tl = run("two_level", None)
    _, rn_jac = run("jacobi", "jacobi")
    assert rn_tl < 1e-10, rn_tl
    assert rn_jac > 1e-7, rn_jac  # scalar Jacobi stalls at this budget

    # host LU reference on the same problem
    heat1, mech1, qT1, qu1, T1, u1, _, _ = build(N)
    blocked1 = BlockedNonlinearProblem(
        [heat1, mech1],
        couplings(heat1, mech1, qT1, qu1),
        options={"ksp_type": "lu"},
    )
    conv, _ = blocked1.solve()
    assert conv
    z_ref = np.concatenate([T1.x, u1.x])
    scale = float(np.abs(z_ref).max())
    np.testing.assert_allclose(
        z_tl, z_ref, rtol=1e-6, atol=1e-8 * max(1.0, scale)
    )


@pytest.mark.slow
def test_blocked_step_banded_unstructured():
    """The BLOCKED fused step's per-qmap gathers/assembly route through the
    banded lane-gather engine when the field domains' plans built (VERDICT r4
    directive 6 — previously always scalar dofmap ops). Unstructured Delaunay
    thermo-mechanical problem big enough to clear the banded size gate
    (ne*ndof_el >= 8192 on the vector field); the banded route must agree
    with the scalar route to gather-reassociation round-off AND with the
    host LU solve."""
    import sys as _sys
    import pathlib as _pl

    import jax

    from scipy.spatial import Delaunay

    from dolfinx_materials_tpu.fem.mesh import Mesh as _Mesh

    _sys.path.insert(0, str(_pl.Path(__file__).parent))
    from test_blocked import build, couplings

    from dolfinx_materials_tpu.solvers import BlockedNonlinearProblem
    from dolfinx_materials_tpu.parallel import make_sharded_blocked_step

    cmesh = device_mesh(8)
    rng = np.random.default_rng(3)
    g = 38  # 2888 triangles: Vu has ne*ndof_el = 17328 >= 8192
    xx, yy = np.meshgrid(np.arange(g + 1), np.arange(g + 1))
    pts = np.stack([xx, yy], -1).reshape(-1, 2) / g
    pts += np.where(
        ((pts > 0) & (pts < 1)), rng.uniform(-0.2 / g, 0.2 / g, pts.shape), 0.0
    )
    tri = _Mesh(pts, Delaunay(pts).simplices.astype(np.int32), "triangle")
    tri = reorder_mesh(tri)

    # host reference
    heat1, mech1, qT1, qu1, T1, u1, _, _ = build(mesh=tri)
    blocked1 = BlockedNonlinearProblem(
        [heat1, mech1], couplings(heat1, mech1, qT1, qu1),
        options={"ksp_type": "lu"},
    )
    conv, _ = blocked1.solve()
    assert conv
    z_ref = np.concatenate([T1.x, u1.x])
    scale = float(np.abs(z_ref).max())

    def run(use_banded):
        heat, mech, qT, qu, T, u, _, _ = build(mesh=tri)
        if use_banded:
            assert qu.domain._banded is not None, (
                "banded plans must build on the vector field here"
            )
        blocked = BlockedNonlinearProblem(
            [heat, mech], couplings(heat, mech, qT, qu)
        )
        step, _ = make_sharded_blocked_step(
            blocked, cmesh, n_newton=16, n_cg=600, use_banded=use_banded
        )
        mask, vals = blocked._masks()
        z0 = np.concatenate([T.x, u.x])
        z0[np.asarray(mask)] = np.asarray(vals)[np.asarray(mask)]
        states0 = [qi.material.data_manager.s0.internal for qi in (qT, qu)]
        # f32: the dtype the banded TPU kernel serves (f64 takes the scalar
        # path by design); on CPU _banded_take is the exact XLA oracle
        z_sh, _, rn = step(
            jnp.asarray(z0, jnp.float32),
            jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), states0),
            mask,
            jnp.asarray(np.asarray(vals), jnp.float32),
            0.0,
        )
        return np.asarray(z_sh), float(rn)

    z_banded, rn_b = run(True)
    z_scalar, rn_s = run(False)
    # both f32 routes converge and agree with each other tightly...
    assert rn_b < 1e-3 * 70e3 and rn_s < 1e-3 * 70e3
    np.testing.assert_allclose(
        z_banded, z_scalar, rtol=2e-4, atol=2e-4 * max(1.0, scale)
    )
    # ...and with the f64 host LU answer at f32 accuracy
    np.testing.assert_allclose(
        z_banded, z_ref, rtol=5e-3, atol=5e-4 * max(1.0, scale)
    )


@pytest.mark.slow
def test_blocked_step_interface():
    """The fused BLOCKED step with an INTERFACE law: the two-submesh sandwich
    (duplicated interface dofs joined by an elastic traction law) matches the
    host blocked solver."""
    from dolfinx_materials_tpu.fem.submesh import (
        InterfaceDomain,
        InterfaceTerm,
        elastic_interface,
        extract_submesh,
        interface_facets,
    )
    from dolfinx_materials_tpu.parallel import make_sharded_blocked_step
    from dolfinx_materials_tpu.solvers import BlockedNonlinearProblem

    cmesh = device_mesh(8)
    parent = create_rectangle((0, 0), (1.0, 0.5), (8, 4), "quad")
    centers = parent.cell_centers()
    cells_a = np.nonzero(centers[:, 0] < 0.5)[0].astype(np.int32)
    cells_b = np.nonzero(centers[:, 0] > 0.5)[0].astype(np.int32)
    mesh_a, vmap_a = extract_submesh(parent, cells_a)
    mesh_b, vmap_b = extract_submesh(parent, cells_b)
    Va = FunctionSpace(mesh_a, 1, (2,))
    Vb = FunctionSpace(mesh_b, 1, (2,))
    fverts = interface_facets(parent, cells_a, cells_b)
    idom = InterfaceDomain(Va, Vb, fverts, vmap_a, vmap_b)
    law = elastic_interface(5e4)

    def build_pair():
        probs, mats = [], []
        for V in (Va, Vb):
            m = Material(
                vonMisesIsotropicHardening(
                    LinearElasticIsotropic(E, nu), LinearHardening(sig0, 1e3)
                )
            )
            q = QuadratureMap(V, 2, m)
            q.register_gradient("Strain", mandel_strain_2d())
            if V is Va:
                left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0))
                bcs = [DirichletBC(left, 0.0)]
            else:
                rx = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1.0), 0)
                ry = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1.0), 1)
                bcs = [DirichletBC(rx, 2e-3), DirichletBC(ry, 0.0)]
            probs.append(
                NonlinearMaterialProblem(q, Function(V), bcs=bcs)
            )
            mats.append(m)
        itf = InterfaceTerm(0, 1, idom, law)
        return probs, mats, itf

    probs1, mats1, itf1 = build_pair()
    blocked1 = BlockedNonlinearProblem(
        probs1, interfaces=[itf1], options={"ksp_type": "lu"}
    )
    conv, _ = blocked1.solve()
    assert conv
    z_ref = np.concatenate([p.u.x for p in probs1])

    probs2, mats2, itf2 = build_pair()
    blocked2 = BlockedNonlinearProblem(probs2, interfaces=[itf2])
    step, _ = make_sharded_blocked_step(blocked2, cmesh, n_newton=16, n_cg=500)
    mask, vals = blocked2._masks()
    z0 = np.zeros(blocked2.ndofs)
    z0[np.asarray(mask)] = np.asarray(vals)[np.asarray(mask)]
    states0 = [p._terms[0]["qmap"].material.data_manager.s0.internal for p in probs2]
    z_sh, states, rn = step(jnp.asarray(z0), states0, mask, vals, 0.0)
    assert float(rn) < 1e-7 * E
    np.testing.assert_allclose(np.asarray(z_sh), z_ref, rtol=1e-5, atol=1e-9)


@pytest.mark.slow
def test_general_step_shard_dofs_two_materials_thermal():
    """`shard_dofs=True` on the GENERAL step (roadmap r3 gap: dof vectors
    were replicated): the two-material mechanics problem and the thermal
    ESV problem both reproduce their replicated-dof solutions exactly —
    including the dof-padding path (44- and 72-dof vectors over 8 devices)."""
    cmesh = device_mesh(8)

    # -- two-material mechanics (multi-qmap assembly + plastic state) -----
    mesh = create_unit_square(5, 5, "quad")
    V = FunctionSpace(mesh, 1, (2,))
    exx = 3 * sig0 / E
    cells = np.arange(mesh.num_cells)
    subsets = [cells[cells % 2 == 0], cells[cells % 2 == 1]]

    def build_mech():
        mats, qmaps = [], []
        for sub, hard in zip(
            subsets,
            (LinearHardening(sig0, 1000.0), VoceHardening(sig0, 500.0, 1e3)),
        ):
            m = Material(
                vonMisesIsotropicHardening(LinearElasticIsotropic(E, nu), hard)
            )
            q = QuadratureMap(V, 2, m, cells=sub)
            q.register_gradient("Strain", mandel_strain_2d())
            mats.append(m)
            qmaps.append(q)
        bcs = mech_bcs(V, exx)
        prob = NonlinearMaterialProblem(
            qmaps, Function(V), bcs=bcs, options={"ksp_type": "lu"}
        )
        return mats, qmaps, bcs, prob

    results = {}
    for shard_dofs in (False, True):
        mats, qmaps, bcs, prob = build_mech()
        step, _ = make_sharded_newton_step_general(
            prob, cmesh, n_newton=14, n_cg=300, shard_dofs=shard_dofs
        )
        mask, vals = combine_bcs(bcs, V.num_dofs)
        u_sh, states, rn = step(
            jnp.zeros(V.num_dofs),
            [m.data_manager.s0.internal for m in mats],
            mask,
            vals,
            0.0,
        )
        assert float(rn) < 1e-8 * E
        results[shard_dofs] = (np.asarray(u_sh), states)

    u_rep, st_rep = results[False]
    u_shd, st_shd = results[True]
    assert u_shd.shape == (V.num_dofs,)
    np.testing.assert_allclose(u_shd, u_rep, rtol=1e-9, atol=1e-12)
    for a, b in zip(st_rep, st_shd):
        np.testing.assert_allclose(
            np.asarray(b["p"]), np.asarray(a["p"]), rtol=1e-9, atol=1e-14
        )

    # -- thermal ESV problem (non-default residual term, scalar space) ----
    A, B = 0.0375, 2.165e-4
    T0v, T1v = 300.0, 800.0
    mesh_t = create_rectangle((0, 0), (1.0, 0.2), (10, 3), "quad")
    Vt = FunctionSpace(mesh_t, 1, ())

    def build_thermal():
        mat = Material(NonlinearHeatTransfer(A=A, B=B, dim=2))
        qmap = QuadratureMap(Vt, 2, mat)
        qmap.register_gradient("TemperatureGradient", scalar_gradient())
        qmap.register_external_state_variable("Temperature", scalar_value())
        left = locate_dofs_geometrical(Vt, lambda x: np.isclose(x[:, 0], 0.0))
        right = locate_dofs_geometrical(Vt, lambda x: np.isclose(x[:, 0], 1.0))
        bcs = [DirichletBC(left, T0v), DirichletBC(right, T1v)]
        T = Function(Vt)
        T.x[:] = T0v
        prob = NonlinearMaterialProblem(
            qmap,
            T,
            bcs=bcs,
            residual_terms=[[("HeatFlux", scalar_gradient())]],
            options={"ksp_type": "lu", "atol": 1e-8},
        )
        return mat, bcs, T, prob

    mat1, bcs1, T1f, prob1 = build_thermal()
    conv, _ = prob1.solve()
    assert conv

    mat2, bcs2, _, prob2 = build_thermal()
    step, _ = make_sharded_newton_step_general(
        prob2, cmesh, n_newton=12, n_cg=200, shard_dofs=True
    )
    mask, vals = combine_bcs(bcs2, Vt.num_dofs)
    u0 = np.full(Vt.num_dofs, T0v)
    u0[mask] = vals[mask]
    u_sh, _, rn = step(
        jnp.asarray(u0), [mat2.data_manager.s0.internal], mask, vals, 0.0
    )
    assert float(rn) < 1e-8 * abs(T1v)
    np.testing.assert_allclose(np.asarray(u_sh), T1f.x, rtol=1e-8, atol=1e-8)


@pytest.mark.slow
def test_blocked_step_props_and_rotation():
    """The fused BLOCKED step with SPATIALLY-VARYING material properties and
    a constant material-frame ROTATION (the round-3 NotImplementedError gaps):
    a thermo-mechanical blocked problem whose mechanics material carries a
    per-quadrature-point Young modulus and a fiber-reinforcement axis rotated
    0.25 rad off the global frame must match the host BlockedNonlinearProblem
    LU solve (which routes rotations/props through Material.integrate — the
    reference's MGIS rotation + mastered-property path, mfront.py:106-114,
    336-343)."""
    from dolfinx_materials_tpu.models.base import Behavior
    from dolfinx_materials_tpu.models.thermal import ThermoMechanicalHeat
    from dolfinx_materials_tpu.ops import tensors as tn
    from dolfinx_materials_tpu.parallel import make_sharded_blocked_step
    from dolfinx_materials_tpu.solvers import BlockedNonlinearProblem

    cmesh = device_mesh(8)
    T0v, alpha_th, chi = 293.15, 1e-3, 6e3

    class VaryingFiberThermoElastic(Behavior):
        """Isotropic thermo-elasticity + a fiber stiffening along the MATERIAL
        x-axis, with a spatially-varying Young modulus material property. The
        fiber term makes the frame rotation physically meaningful (an
        isotropic law would mask a transpose bug in the rotation plumbing)."""

        material_properties = {"YoungModulus": 1}

        def __init__(self, nu, alpha_th, T0):
            self.nu, self.alpha_th, self.T0v = nu, alpha_th, T0
            self.gradients = {"Strain": 6}
            self.fluxes = {"Stress": 6}
            self.external_state_variables = {"Temperature": 1}
            self.extra_tangent_blocks = [("Stress", "Temperature")]

        def constitutive_update(self, inputs, state, dt):
            Ev = inputs["YoungModulus"]
            eps = inputs["Strain"]
            T = inputs["Temperature"][0]
            I2 = jnp.asarray(tn.I2, eps.dtype)
            e = eps - self.alpha_th * (T - self.T0v) * I2
            lmbda = Ev * self.nu / (1 + self.nu) / (1 - 2 * self.nu)
            mu = Ev / 2 / (1 + self.nu)
            sig = lmbda * tn.tr(e) * I2 + 2 * mu * e
            # fiber reinforcement along the material x-axis
            sig = sig.at[0].add(0.4 * Ev * e[0])
            return {"Stress": sig}, state

    angle = 0.25
    c, s = np.cos(angle), np.sin(angle)
    R = jnp.asarray([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])

    def vol_strain():
        def expr(ctx):
            g = ctx.grad
            return jnp.stack([g[0, 0] + g[1, 1]])

        return expr

    N = 6

    def build():
        mesh = create_rectangle((0, 0), (1.0, 1.0), (N, N), "quad")
        VT = FunctionSpace(mesh, 1, ())
        mat_T = Material(ThermoMechanicalHeat(k=1.0, kappa=1.0, chi=chi, T0=T0v))
        qT = QuadratureMap(VT, 2, mat_T)
        qT.register_gradient("TemperatureGradient", scalar_gradient())
        qT.register_external_state_variable("Temperature", scalar_value())
        leftT = locate_dofs_geometrical(VT, lambda x: np.isclose(x[:, 0], 0.0))
        rightT = locate_dofs_geometrical(VT, lambda x: np.isclose(x[:, 0], 1.0))
        T = Function(VT)
        T.x[:] = T0v
        heat = NonlinearMaterialProblem(
            qT,
            T,
            bcs=[DirichletBC(leftT, T0v + 50.0), DirichletBC(rightT, T0v)],
            residual_terms=[
                [
                    ("HeatFlux", scalar_gradient(), -1.0),
                    ("Source", scalar_value(), 1.0),
                ]
            ],
            options={"ksp_type": "lu"},
        )

        Vu = FunctionSpace(mesh, 1, (2,))
        mat_u = Material(VaryingFiberThermoElastic(nu, alpha_th, T0v))
        mat_u.rotation_matrix = R
        qu = QuadratureMap(Vu, 2, mat_u)
        qu.register_gradient("Strain", mandel_strain_2d())
        qu.register_external_state_variable("Temperature", T0v)
        # per-point modulus from the quadrature coordinates (identical in
        # both builds): stiffer toward x = 1
        x_q = np.asarray(qu.domain.x_q).reshape(-1, qu.domain.x_q.shape[-1])
        Evar = E * (1.0 + 0.5 * x_q[:, 0])
        mat_u.update_material_property("YoungModulus", Evar)
        clamped = locate_dofs_geometrical(
            Vu, lambda x: np.isclose(x[:, 0], 0.0) | np.isclose(x[:, 0], 1.0)
        )
        u = Function(Vu)
        mech = NonlinearMaterialProblem(
            qu, u, bcs=[DirichletBC(clamped, 0.0)], options={"ksp_type": "lu"}
        )
        coups = [
            (1, 0, qu, "Stress", "Temperature", scalar_value()),
            (0, 1, qT, "Source", "VolStrain", vol_strain()),
        ]
        return heat, mech, qT, qu, T, u, coups

    # host reference
    heat1, mech1, qT1, qu1, T1, u1, coups1 = build()
    blocked1 = BlockedNonlinearProblem(
        [heat1, mech1], coups1, options={"ksp_type": "lu"}
    )
    conv, _ = blocked1.solve()
    assert conv
    z_ref = np.concatenate([T1.x, u1.x])

    # fused sharded blocked step
    heat2, mech2, qT2, qu2, T2, u2, coups2 = build()
    blocked2 = BlockedNonlinearProblem([heat2, mech2], coups2)
    step, _ = make_sharded_blocked_step(blocked2, cmesh, n_newton=16, n_cg=400)
    mask, vals = blocked2._masks()
    z0 = np.concatenate([T2.x, u2.x])
    z0[np.asarray(mask)] = np.asarray(vals)[np.asarray(mask)]
    states0 = [q.material.data_manager.s0.internal for q in (qT2, qu2)]
    z_sh, states, rn = step(jnp.asarray(z0), states0, mask, vals, 0.0)
    assert float(rn) < 1e-7 * E
    scale = float(np.abs(z_ref).max())
    np.testing.assert_allclose(
        np.asarray(z_sh), z_ref, rtol=1e-6, atol=1e-8 * max(1.0, scale)
    )
    # the rotation actually matters: an UNROTATED copy of the same problem
    # must give a different displacement field
    heat3, mech3, qT3, qu3, T3, u3, coups3 = build()
    qu3.material.rotation_matrix = None
    blocked3 = BlockedNonlinearProblem(
        [heat3, mech3], coups3, options={"ksp_type": "lu"}
    )
    conv, _ = blocked3.solve()
    assert conv
    z_norot = np.concatenate([T3.x, u3.x])
    assert np.abs(z_norot - z_ref).max() > 1e-8 * scale


def test_general_step_p1_coarse_p2_tet():
    """The geometric P2->P1 coarse space (coarse_modes="p1",
    parallel/sharding.py:_p1_coarse) through the GENERAL mixed-precision
    step on P2 tets must reproduce the host LU solve — the continuous
    vertex-hat coarse basis used by the tet-P2 Ogden benchmark study
    (docs/perf.md). Guards the parents/weights tables against the P2 node
    renumbering and the vertex-footprint coarse assembly."""
    import jax

    from dolfinx_materials_tpu.fem import create_unit_cube
    from dolfinx_materials_tpu.fem.forms import mandel_strain_3d

    cmesh = device_mesh(8)
    mesh = create_unit_cube(3, 3, 3, "tetrahedron")
    V = FunctionSpace(mesh, 2, (3,))
    exx = 1e-3

    def build():
        m = Material(LinearElasticIsotropic(E, nu))
        q = QuadratureMap(V, 4, m)
        q.register_gradient("Strain", mandel_strain_3d())
        bcs = mech_bcs(V, exx) + [
            DirichletBC(
                locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 2], 0), 2),
                0.0,
            )
        ]
        prob = NonlinearMaterialProblem(
            q, Function(V), bcs=bcs, options={"ksp_type": "lu"}
        )
        return m, q, bcs, prob

    m1, q1, bcs1, prob1 = build()
    conv, _ = prob1.solve()
    assert conv

    m2, q2, bcs2, prob2 = build()
    step, _ = make_sharded_newton_step_general(
        prob2, cmesh, n_newton=4, n_cg=300, rtol=1e-10, cg_rtol=1e-10,
        precision="mixed", coarse_modes="p1", return_info=True,
    )
    mask, vals = combine_bcs(bcs2, V.num_dofs)
    st0 = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float64), m2.data_manager.s0.internal
    )
    u_sh, states, rn, rn0 = step(
        jnp.zeros(V.num_dofs), [st0], mask, jnp.asarray(vals, jnp.float64),
        0.0,
    )
    assert float(rn) < 1e-7 * float(rn0)
    np.testing.assert_allclose(np.asarray(u_sh), prob1.u.x, rtol=1e-5, atol=1e-9)
