"""Per-step Newton/CG iteration telemetry for the tet-P2 mixed protocol
(VERDICT r4 directive 2): where do the 13-15 s go? Temporary probe."""
import sys, time
sys.path.insert(0, ".")
from dolfinx_materials_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import importlib.util as ilu
spec = ilu.spec_from_file_location("ogden_demo", "demos/ogden_block_tpu.py")
mod = ilu.module_from_spec(spec)
spec.loader.exec_module(mod)

from dolfinx_materials_tpu import NonlinearMaterialProblem
from dolfinx_materials_tpu.fem import Function
from dolfinx_materials_tpu.fem.bc import combine_bcs
from dolfinx_materials_tpu.parallel import device_mesh, make_sharded_newton_step_general

N, n_newton, n_cg, rtol, cg_rtol = 8, 20, 50, 1e-6, 1e-3
if len(sys.argv) > 1:
    n_cg = int(sys.argv[1])
if len(sys.argv) > 2:
    rtol = float(sys.argv[2])
if len(sys.argv) > 3 and not sys.argv[3].startswith("--"):
    cg_rtol = float(sys.argv[3])
EXTRAP = "--extrap" in sys.argv

mat, qmap, V, bcs, bc_top = mod.build(N, "tetrahedron", 2)
prob = NonlinearMaterialProblem(qmap, Function(V), bcs=bcs)
step, _ = make_sharded_newton_step_general(
    prob, device_mesh(1), n_newton=n_newton, n_cg=n_cg, rtol=rtol,
    cg_rtol=cg_rtol, precision="mixed", coarse_modes="rbm",
    return_info="stats",
)
mask, _ = combine_bcs(bcs, V.num_dofs)
mask = jnp.asarray(mask)
st0 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                   mat.data_manager.s0.internal)

def run_all(report=False):
    u = jnp.zeros(V.num_dofs, jnp.float64)
    u_prev = u
    st = st0
    tot_n = tot_cg = 0
    rows = []
    for ez in np.linspace(0, 0.2, 11)[1:]:
        bc_top.set(-float(ez))
        _, vals = combine_bcs(bcs, V.num_dofs)
        guess = u + (u - u_prev) if EXTRAP else u
        u_prev = u
        t0 = time.perf_counter()
        u, sts, rn, rn0, (n_it, cg) = step(guess, [st], mask,
                                           jnp.asarray(vals, jnp.float64), 0.0)
        n_it = int(n_it); cg = int(cg)
        dt = time.perf_counter() - t0
        print(f"    [step ez={ez:.2f} done {dt:.1f}s]", flush=True)
        st = sts[0]
        tot_n += n_it; tot_cg += cg
        rows.append((ez, dt, n_it, cg, float(rn / max(float(rn0), 1e-300))))
    if report:
        for ez, dt, n_it, cg, rel in rows:
            print(f"  ez={ez:.2f}: {dt*1e3:7.1f} ms  {n_it:3d} newton  "
                  f"{cg:5d} cg  rel|R|={rel:.1e}", flush=True)
    return tot_n, tot_cg

print(f"config: N={N} P2 tets, {n_newton}N x {n_cg}CG, rtol={rtol}, "
      f"cg_rtol={cg_rtol}", flush=True)
t0 = time.perf_counter()
run_all()
print(f"first (incl compile): {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter()
tn, tc = run_all(report=True)
t_warm = time.perf_counter() - t0
print(f"warm total {t_warm:.2f}s (py-loop, ~0.5s dispatch):  "
      f"{tn} newton its, {tc} cg its "
      f"-> {t_warm/max(tn,1)*1e3:.1f} ms/newton incl cg, "
      f"{tc/max(tn,1):.1f} cg/newton", flush=True)
