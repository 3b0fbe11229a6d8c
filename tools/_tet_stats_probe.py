"""tet-P2 telemetry probe: stats-instrumented 10-step run at a given config."""
import sys, time
sys.path.insert(0, ".")
from dolfinx_materials_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from demos.ogden_block_tpu import build
from dolfinx_materials_tpu import NonlinearMaterialProblem
from dolfinx_materials_tpu.fem import Function
from dolfinx_materials_tpu.fem.bc import combine_bcs
from dolfinx_materials_tpu.parallel import device_mesh, make_sharded_newton_step_general

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
nn = int(sys.argv[2]) if len(sys.argv) > 2 else 25
ncg = int(sys.argv[3]) if len(sys.argv) > 3 else 50
rtol = float(sys.argv[4]) if len(sys.argv) > 4 else 1e-4
cg_rtol = float(sys.argv[5]) if len(sys.argv) > 5 else 1e-3
coarse = sys.argv[6] if len(sys.argv) > 6 else "rbm"

jax.config.update("jax_enable_x64", True)
mat, qmap, V, bcs, bc_top = build(N, "tetrahedron", 2)
prob = NonlinearMaterialProblem(qmap, Function(V), bcs=bcs)
step, _ = make_sharded_newton_step_general(
    prob, device_mesh(1), n_newton=nn, n_cg=ncg, rtol=rtol, cg_rtol=cg_rtol,
    precision="mixed", coarse_modes=coarse, return_info="stats",
)
mask, _ = combine_bcs(bcs, V.num_dofs)
mask = jnp.asarray(mask)
st0 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), mat.data_manager.s0.internal)
bc_vals = []
for ez in np.linspace(0, 0.2, 11)[1:]:
    bc_top.set(-float(ez))
    _, vals = combine_bcs(bcs, V.num_dofs)
    bc_vals.append(jnp.asarray(vals, jnp.float64))
vals_stack = jnp.stack(bc_vals)

@jax.jit
def run_scan(u0, s0):
    def body(carry, vals):
        u, u_prev, st = carry
        guess = u + (u - u_prev)
        un, sts, rn, rn0, (nit, cgs) = step(guess, [st], mask, vals, 0.0)
        return (un, u, sts[0]), (rn, rn0, nit, cgs)
    (u, _, _), out = jax.lax.scan(body, (u0, u0, s0), vals_stack)
    return u, out

u0 = jnp.zeros(V.num_dofs, jnp.float64)
t0 = time.perf_counter()
u, (rns, rn0s, nits, cgss) = run_scan(u0, st0)
jax.block_until_ready(u)
print(f"first (incl compile): {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
u, (rns, rn0s, nits, cgss) = run_scan(u0, st0)
jax.block_until_ready(u)
t = time.perf_counter() - t0
rel = np.asarray(rns)/np.maximum(np.asarray(rn0s), 1e-300)
print(f"CONFIG N={N} nn={nn} ncg={ncg} rtol={rtol} cg_rtol={cg_rtol} coarse={coarse}")
print(f"warm 10-step: {t:.2f}s  max rel_R {rel.max():.2e}")
print("newton its/step:", np.asarray(nits).tolist())
print("cg its/step:   ", np.asarray(cgss).tolist())
