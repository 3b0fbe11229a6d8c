"""Mixed-precision fused step: f64 residual path + scaled f32 CG.

The machinery behind the reference's composite benchmark (Ogden matrix +
E_pen=1e12 SVK inclusions, reference demos/mfront/hyperelasticity/
hyperelasticity.py:186): plain f32 CG cannot survive the stiffness contrast,
mixed precision with explicit symmetric scaling and rigid-body-mode
aggregates must converge to f64-level residuals.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_unit_cube,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.bc import combine_bcs
from dolfinx_materials_tpu.fem.forms import mandel_strain_3d
from dolfinx_materials_tpu.models import LinearElasticIsotropic
from dolfinx_materials_tpu.parallel import (
    device_mesh,
    make_sharded_newton_step_general,
)


def _mech_bcs(V, ex):
    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0.0))
    right = [
        locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1.0), c)
        for c in range(3)
    ]
    return [
        DirichletBC(left, 0.0),
        DirichletBC(right[0], ex),
        DirichletBC(right[1], 0.0),
        DirichletBC(right[2], 0.0),
    ]


def _build(subsets, mats_E, ex):
    mesh = create_unit_cube(3, 3, 3, "tetrahedron")
    V = FunctionSpace(mesh, 1, (3,))
    mats, qmaps = [], []
    for sub, E in zip(subsets(mesh), mats_E):
        m = Material(LinearElasticIsotropic(E, 0.3 if E < 1e10 else 0.0))
        q = QuadratureMap(V, 2, m, cells=sub)
        q.register_gradient("Strain", mandel_strain_3d())
        mats.append(m)
        qmaps.append(q)
    bcs = _mech_bcs(V, ex)
    prob = NonlinearMaterialProblem(
        qmaps, Function(V), bcs=bcs, options={"ksp_type": "lu"}
    )
    return V, mats, qmaps, bcs, prob


def _contrast_subsets(mesh):
    """Inclusion = cells whose centroid is in the center eighth of the cube
    (matrix listed FIRST, inclusion second for agg_split_materials)."""
    c = mesh.cell_centers()
    incl = (
        (np.abs(c[:, 0] - 0.5) < 0.2)
        & (np.abs(c[:, 1] - 0.5) < 0.2)
        & (np.abs(c[:, 2] - 0.5) < 0.2)
    )
    cells = np.arange(mesh.num_cells)
    return [cells[~incl], cells[incl]]


@pytest.mark.parametrize("coarse_modes", ["trans", "rbm"])
def test_mixed_precision_high_contrast_matches_host(coarse_modes):
    """1e12/1e5 stiffness contrast: the mixed step must reach per-step
    relative residual <= 1e-8 (f64 territory, far past the f32 floor) and
    match the host f64 LU solve."""
    ex = 1e-2
    V, mats1, _, _, prob1 = _build(_contrast_subsets, (1e5, 1e12), ex)
    conv, _ = prob1.solve()
    assert conv
    u_ref = np.asarray(prob1.u.x)

    V, mats2, _, bcs2, prob2 = _build(_contrast_subsets, (1e5, 1e12), ex)
    step, _ = make_sharded_newton_step_general(
        prob2,
        device_mesh(4),
        n_newton=12,
        n_cg=200,
        cg_rtol=1e-5,
        precision="mixed",
        coarse_modes=coarse_modes,
        agg_split_materials=True,
        return_info=True,
    )
    mask, vals = combine_bcs(bcs2, V.num_dofs)
    u, states, rn, rn0 = step(
        jnp.zeros(V.num_dofs),
        [m.data_manager.s0.internal for m in mats2],
        mask,
        vals,
        0.0,
    )
    assert np.asarray(u).dtype == np.float64
    rel = float(rn) / float(rn0)
    assert rel < 1e-8, f"relative residual {rel:.2e} not in f64 territory"
    err = np.abs(np.asarray(u) - u_ref).max() / np.abs(u_ref).max()
    assert err < 1e-6, f"displacement error vs host f64 LU: {err:.2e}"


def test_rbm_coarse_same_mode_matches_host():
    """RBM coarse modes in plain (same-precision) mode still converge and
    match the host solve on homogeneous 3D elasticity."""
    ex = 1e-2
    V, mats1, _, _, prob1 = _build(
        lambda m: [np.arange(m.num_cells)], (1e5,), ex
    )
    conv, _ = prob1.solve()
    assert conv
    u_ref = np.asarray(prob1.u.x)

    V, mats2, _, bcs2, prob2 = _build(
        lambda m: [np.arange(m.num_cells)], (1e5,), ex
    )
    step, _ = make_sharded_newton_step_general(
        prob2, device_mesh(4), n_newton=10, n_cg=200, coarse_modes="rbm"
    )
    mask, vals = combine_bcs(bcs2, V.num_dofs)
    u, states, rn = step(
        jnp.zeros(V.num_dofs),
        [m.data_manager.s0.internal for m in mats2],
        mask,
        vals,
        0.0,
    )
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=1e-6, atol=1e-12)


def test_f32_same_mode_fails_contrast_documented():
    """Sanity anchor for the design: the SAME contrast problem in plain f32
    leaves a relative residual orders above the mixed path's (this is the
    f32-conditioning wall VERDICT r3 documents, not a regression)."""
    ex = 1e-2
    V, mats2, _, bcs2, prob2 = _build(_contrast_subsets, (1e5, 1e12), ex)
    step, _ = make_sharded_newton_step_general(
        prob2,
        device_mesh(4),
        n_newton=12,
        n_cg=200,
        cg_rtol=1e-5,
        return_info=True,
    )
    mask, vals = combine_bcs(bcs2, V.num_dofs)
    # force the f32 path by feeding f32 inputs (x64 stays enabled globally)
    u, states, rn, rn0 = step(
        jnp.zeros(V.num_dofs, jnp.float32),
        [
            jax.tree.map(
                lambda a: jnp.asarray(a, jnp.float32),
                m.data_manager.s0.internal,
            )
            for m in mats2
        ],
        mask,
        jnp.asarray(vals, jnp.float32),
        0.0,
    )
    rel_f32 = float(rn) / float(rn0)
    assert rel_f32 > 1e-7  # the wall (typically ~1e-4..1e-2 here)
