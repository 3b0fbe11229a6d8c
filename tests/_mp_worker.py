"""Worker for tests/test_multiprocess.py: one controller of an N-process job.

Default mode: solves the sharp-Voce J2 plate with the fused dof-sharded
Newton step over the GLOBAL (num_processes x devices_per_process) mesh and
writes the gathered ``u`` / plastic state to ``outfile`` (process 0 only).
``--blocked``: instead runs the fused BLOCKED multi-field step (stiff
thermo-mechanical coupling) — the newest fused machinery under a real
multi-controller job. Run with num_processes=1 for the single-process
reference.

Usage: python _mp_worker.py OUTFILE LOCAL_DEVICES [--blocked] pid nproc coordinator
"""

import sys

args = [a for a in sys.argv[1:] if a != "--blocked"]
BLOCKED = "--blocked" in sys.argv
outfile, local_devices, pid, nproc, coord = args[:5]
pid, nproc, local_devices = int(pid), int(nproc), int(local_devices)

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dolfinx_materials_tpu.parallel import multiprocess as mp

jax = mp.initialize(
    pid, nproc, coord, local_devices=local_devices, enable_x64=True
)

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
    VoceHardening,
    vonMisesIsotropicHardening,
)
from dolfinx_materials_tpu.parallel import make_sharded_newton_step

assert jax.device_count() == nproc * local_devices
cmesh = mp.global_device_mesh(("dcn", "ici"))

E, nu, sig0 = 70e3, 0.3, 350.0
mat = Material(
    vonMisesIsotropicHardening(
        LinearElasticIsotropic(E, nu), VoceHardening(sig0, 500.0, 1e3)
    )
)
mesh = create_unit_square(5, 5, "quad")
V = FunctionSpace(mesh, 1, (2,))
exx = 3 * sig0 / E

qmap = QuadratureMap(V, 2, mat)
qmap.register_gradient("Strain", mandel_strain_2d())
left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0), 0)
bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0), 1)
right = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1), 0)
bcs = [DirichletBC(left, 0.0), DirichletBC(bottom, 0.0), DirichletBC(right, exx)]
prob = NonlinearMaterialProblem(qmap, Function(V), bcs=bcs)

results = {}
for shard_dofs in (() if BLOCKED else (False, True)):
    step, _ = make_sharded_newton_step(
        qmap,
        prob,
        cmesh,
        axis=("dcn", "ici"),
        n_newton=12,
        n_cg=200,
        shard_dofs=shard_dofs,
    )
    mask, vals = combine_bcs(bcs, V.num_dofs)
    u, st, rn = step(
        jnp.zeros(V.num_dofs), mat.data_manager.s0.internal, mask, vals, 0.0
    )
    tag = "sharded" if shard_dofs else "replicated"
    results[f"u_{tag}"] = np.asarray(mp.allgather(u))[: V.num_dofs]
    results[f"p_{tag}"] = np.asarray(mp.allgather(st["p"]))[: qmap.num_points]
    results[f"res_{tag}"] = np.asarray(mp.allgather(rn)).reshape(-1)[:1]
    print(f"[{pid}] {tag}: |R| = {float(results[f'res_{tag}'][0]):.3e}", flush=True)

if BLOCKED:
    # fused BLOCKED multi-field step (thermo-mechanical coupling) under the
    # same global mesh — parity with single-process asserted by the test
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_blocked import build, couplings

    from dolfinx_materials_tpu.parallel import make_sharded_blocked_step
    from dolfinx_materials_tpu.solvers import BlockedNonlinearProblem

    heat, mech, qT, qu, Tf, uf, mat_u, mat_T = build()
    blocked = BlockedNonlinearProblem(
        [heat, mech], couplings(heat, mech, qT, qu)
    )
    bstep, _ = make_sharded_blocked_step(
        blocked, cmesh, axis=("dcn", "ici"), n_newton=16, n_cg=400
    )
    bmask, bvals = blocked._masks()
    z0 = np.concatenate([Tf.x, uf.x])
    z0[np.asarray(bmask)] = np.asarray(bvals)[np.asarray(bmask)]
    z_sh, bstates, brn = bstep(
        jnp.asarray(z0),
        [qT.material.data_manager.s0.internal,
         qu.material.data_manager.s0.internal],
        bmask, bvals, 0.0,
    )
    results["z_blocked"] = np.asarray(mp.allgather(z_sh))[: blocked.ndofs]
    results["res_blocked"] = np.asarray(mp.allgather(brn)).reshape(-1)[:1]
    print(f"[{pid}] blocked: |R| = {float(results['res_blocked'][0]):.3e}",
          flush=True)

if pid == 0:
    np.savez(outfile, **results)
print(f"[{pid}] done", flush=True)
