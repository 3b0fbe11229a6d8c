"""Tet-protocol PC/budget experiment (temporary)."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
import importlib.util as ilu
spec = ilu.spec_from_file_location("ogden_block_tpu", "demos/ogden_block_tpu.py")
og = ilu.module_from_spec(spec); spec.loader.exec_module(og)
from dolfinx_materials_tpu.parallel import device_mesh, make_sharded_newton_step
from dolfinx_materials_tpu.fem.bc import combine_bcs
from dolfinx_materials_tpu.fem import Function
from dolfinx_materials_tpu import NonlinearMaterialProblem

def run(n_newton, n_cg, cg_rtol, pc_boxes, label):
    mat, qmap, V, bcs, bc_top = og.build(8, "tetrahedron", 2)
    prob = NonlinearMaterialProblem(qmap, Function(V), bcs=bcs)
    step, _ = make_sharded_newton_step(
        qmap, prob, device_mesh(1), n_newton=n_newton, n_cg=n_cg,
        rtol=2e-5, cg_rtol=cg_rtol, pc_boxes=pc_boxes)
    mask, _ = combine_bcs(bcs, V.num_dofs)
    mask = jnp.asarray(mask)
    st0 = jax.tree.map(jnp.asarray, mat.data_manager.s0.internal)
    bc_vals = []
    for ez in np.linspace(0, 0.2, 11)[1:]:
        bc_top.set(-float(ez))
        _, vals = combine_bcs(bcs, V.num_dofs)
        bc_vals.append(jnp.asarray(vals))
    vals_stack = jnp.stack(bc_vals)
    @jax.jit
    def run_scan(u0, s0):
        def body(carry, vals):
            u, st = carry
            u, st, rn = step(u, st, mask, vals, 0.0)
            return (u, st), rn
        (u, _), rns = jax.lax.scan(body, (u0, s0), vals_stack)
        return u, rns
    t0 = time.perf_counter()
    u, rns = run_scan(jnp.zeros(V.num_dofs), st0)
    jax.block_until_ready(u); t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    u, rns = run_scan(jnp.zeros(V.num_dofs), st0)
    jax.block_until_ready(u); t_warm = time.perf_counter() - t0
    rl = [float(r) for r in rns]
    print(f"{label}: first={t_first:.1f}s warm={t_warm:.2f}s "
          f"finalR={rl[-1]:.2e} maxR={max(rl):.2e}", flush=True)

cfg = sys.argv[1]
if cfg == "base":
    run(20, 150, 1e-8, 8, "base 20Nx150CG rtol1e-8 pb8")
elif cfg == "inexact":
    run(25, 150, 3e-3, 8, "inexact 25Nx150CG cg_rtol3e-3 pb8")
elif cfg == "mid":
    run(25, 150, 1e-4, 8, "mid 25Nx150CG cg_rtol1e-4 pb8")
elif cfg == "inexact2":
    run(30, 80, 1e-2, 8, "inexact2 30Nx80CG cg_rtol1e-2 pb8")
