"""Composite-benchmark telemetry probe (stats at a given config)."""
import sys, time
sys.path.insert(0, ".")
from dolfinx_materials_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
import importlib.util as ilu
spec = ilu.spec_from_file_location("comp_demo", "demos/composite_hyperelasticity_tpu.py")
mod = ilu.module_from_spec(spec)
spec.loader.exec_module(mod)
from dolfinx_materials_tpu.fem.bc import combine_bcs
from dolfinx_materials_tpu.parallel import device_mesh, make_sharded_newton_step_general

nn = int(sys.argv[1]) if len(sys.argv) > 1 else 25
ncg = int(sys.argv[2]) if len(sys.argv) > 2 else 50
rtol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-4
cg_rtol = float(sys.argv[4]) if len(sys.argv) > 4 else 1e-3
coarse = sys.argv[5] if len(sys.argv) > 5 else "rbm"

jax.config.update("jax_enable_x64", True)
mesh, V, mats, qmaps, bcs, bc_rx, prob = mod.build((2, 1, 3))
step, _ = make_sharded_newton_step_general(
    prob, device_mesh(1), n_newton=nn, n_cg=ncg, rtol=rtol, cg_rtol=cg_rtol,
    precision="mixed", coarse_modes=coarse, agg_split_materials=True,
    return_info="stats",
)
bc_vals = []
for exx in np.linspace(0, 0.2, 11)[1:]:
    bc_rx.set(float(exx))
    _, vals = combine_bcs(bcs, V.num_dofs)
    bc_vals.append(jnp.asarray(vals, jnp.float64))
vals_stack = jnp.stack(bc_vals)
mask, _ = combine_bcs(bcs, V.num_dofs)
mask = jnp.asarray(mask)
st0 = [jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), m.data_manager.s0.internal)
       for m in mats]

@jax.jit
def run_scan(u0, s0):
    def body(carry, vals):
        u, u_prev, sts = carry
        guess = u + (u - u_prev)
        un, sts, rn, rn0, (nit, cgs) = step(guess, list(sts), mask, vals, 0.0)
        return (un, u, tuple(sts)), (rn, rn0, nit, cgs)
    (u, _, _), out = jax.lax.scan(body, (u0, u0, tuple(s0)), vals_stack)
    return u, out

u0 = jnp.zeros(V.num_dofs, jnp.float64)
t0 = time.perf_counter()
u, (rns, rn0s, nits, cgss) = run_scan(u0, tuple(st0))
jax.block_until_ready(u)
print(f"first (incl compile): {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
u, (rns, rn0s, nits, cgss) = run_scan(u0, tuple(st0))
jax.block_until_ready(u)
t = time.perf_counter() - t0
rel = np.asarray(rns)/np.maximum(np.asarray(rn0s), 1e-300)
print(f"CONFIG nn={nn} ncg={ncg} rtol={rtol} cg_rtol={cg_rtol} coarse={coarse}")
print(f"warm 10-step: {t:.2f}s  max rel_R {rel.max():.2e}  dofs={V.num_dofs}")
print("newton its/step:", np.asarray(nits).tolist())
print("cg its/step:   ", np.asarray(cgss).tolist())
