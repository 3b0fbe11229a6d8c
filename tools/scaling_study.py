"""Multi-device scaling artifact (VERDICT r4 item 5).

The reference publishes a 1/2/4/8-rank MPI scaling study of its Ogden
benchmark (reference demos/mfront/hyperelasticity/timing_results.csv,
hyperelasticity.py:270-315). This environment has ONE physical TPU chip and a
ONE-core host, so a wall-clock multi-device table cannot be honestly measured
here. What CAN be proven without N chips is how the compiled SPMD program
PARTITIONS the work: XLA's per-compilation cost model gives total flops /
bytes for the n-device program, and the sharded result must match the
1-device result. This script runs the study on the virtual 8-CPU-device mesh
(the driver's multichip dry-run environment) and writes
``docs/scaling_results.csv``:

- ``constitutive``: the Ogden constitutive update (the reference CSV's
  "constitutive" column) via ``make_sharded_constitutive_update`` — zero
  collectives, so per-device flops must fall ~1/N;
- ``fused_step``: one fused Newton load step (J2 plate) via
  ``make_sharded_newton_step`` — per-device flops fall toward the collective/
  replicated-coarse floor;
- ``wall_ms`` is recorded for completeness but ADVISORY ONLY on a 1-core
  host (all virtual devices share the core: expect flat, not falling).

Bit-level agreement across device counts is asserted by
tests/test_sharding.py::test_scaling_partition (mp tier), which re-runs the
constitutive rows of this study.

Run: python tools/scaling_study.py   (forces JAX_PLATFORMS=cpu, 8 devices)
"""

import csv
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# config API, not env vars: the axon TPU plugin overrides JAX_PLATFORMS /
# XLA_FLAGS (tests/conftest.py documents the same gotcha)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_unit_square,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.bc import combine_bcs
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
from dolfinx_materials_tpu.models import (
    LinearElasticIsotropic,
    Ogden,
    VoceHardening,
    vonMisesIsotropicHardening,
)
from dolfinx_materials_tpu.parallel import (
    device_mesh,
    make_sharded_constitutive_update,
    make_sharded_newton_step,
)

OGDEN = dict(mu=(27778.0 * 28.8 / 2.0,), alpha=(28.8,), K=69444444.0)


def _cost(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def constitutive_row(n_devices, n_pts=1 << 13):
    """Ogden constitutive update, n_pts Gauss points sharded over the mesh.
    Returns (flops_per_device, bytes_per_device, wall_ms, outputs).

    Deformation inputs keep the principal stretches WELL SEPARATED: the
    per-point eigen-tangent is legitimately ill-conditioned at coincident
    stretches (the batched kernel switches to the invariant series there,
    ops/matfun_fm.py), and a cross-device-count diff of a ~1/gap-amplified
    quantity would measure rounding noise, not SPMD correctness."""
    mat = Material(Ogden(**OGDEN))
    mesh = device_mesh(n_devices)
    upd = make_sharded_constitutive_update(mat, mesh)
    rng = np.random.default_rng(0)
    stretch = 1.0 + np.stack(
        [
            rng.uniform(0.04, 0.08, n_pts),
            rng.uniform(-0.02, 0.02, n_pts),
            rng.uniform(-0.08, -0.04, n_pts),
        ],
        axis=1,
    )
    # 9-vector ordering [11,22,33,12,21,13,31,23,32] (ops/tensors.py)
    F = np.zeros((n_pts, 9))
    F[:, :3] = stretch  # distinct diagonal stretches
    F[:, 3] = 0.01 * rng.standard_normal(n_pts)  # mild shear (F12)
    x = jnp.asarray(F)
    state = {}
    lowered = jax.jit(upd).lower(x, state, 0.0)
    compiled = lowered.compile()
    # cost_analysis reports the PER-DEVICE SPMD program: the 1-device row is
    # the whole-problem total and perfect partition halves it per doubling
    flops, byts = _cost(compiled)
    out = compiled(x, state, 0.0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = compiled(x, state, 0.0)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) * 1e3
    for leaf in jax.tree.leaves(out):
        assert np.isfinite(np.asarray(leaf)).all(), "non-finite constitutive output"
    return flops, byts, wall, out


def fused_step_row(n_devices, N=24):
    """One fused J2-plate Newton load step sharded over the mesh."""
    E, sig0 = 70e3, 350.0
    cmesh = device_mesh(n_devices)
    mesh = create_unit_square(N, N, "quad")
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
    bcs = [
        DirichletBC(left, 0.0),
        DirichletBC(bottom, 0.0),
        DirichletBC(right, 2 * sig0 / E),
    ]
    problem = NonlinearMaterialProblem(qmap, Function(V), bcs=bcs)
    step, pad = make_sharded_newton_step(
        qmap, problem, cmesh, n_newton=6, n_cg=60
    )
    mask, vals = combine_bcs(bcs, V.num_dofs)
    args = (
        jnp.zeros(V.num_dofs),
        pad(mat.data_manager.s0.internal),
        jnp.asarray(mask),
        jnp.asarray(vals),
        0.0,
    )
    lowered = step.lower(*args)
    compiled = lowered.compile()
    flops, byts = _cost(compiled)  # per-device SPMD program (see above)
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = compiled(*args)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) * 1e3
    return flops, byts, wall, out


def main(write_csv=True):
    rows = []
    ref = {}
    for nd in (1, 2, 4, 8):
        cf, cb, cw, cout = constitutive_row(nd)
        sf, sb, sw, sout = fused_step_row(nd)
        if nd == 1:
            ref["c"] = jax.tree.map(np.asarray, cout)
            ref["s"] = np.asarray(sout[0])
            cdiff = sdiff = 0.0
        else:
            cd = jax.tree.map(
                lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
                cout, ref["c"],
            )
            cdiff = max(jax.tree.leaves(cd))
            sdiff = float(
                np.max(np.abs(np.asarray(sout[0]) - ref["s"]))
                / max(np.max(np.abs(ref["s"])), 1e-30)
            )
        rows.append(
            dict(
                n_devices=nd,
                constitutive_flops_per_device=cf,
                constitutive_bytes_per_device=cb,
                constitutive_wall_ms=round(cw, 2),
                constitutive_max_abs_diff_vs_1dev=cdiff,
                fused_step_flops_per_device=sf,
                fused_step_bytes_per_device=sb,
                fused_step_wall_ms=round(sw, 2),
                fused_step_rel_diff_vs_1dev=sdiff,
            )
        )
        print(rows[-1])
    if write_csv:
        path = os.path.join(
            os.path.dirname(__file__), "..", "docs", "scaling_results.csv"
        )
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {os.path.abspath(path)}")
    return rows


if __name__ == "__main__":
    main()
