"""A/B: specialized fused step vs general fused step (stencil dof-ops) on the
benched 64x64 J2 plate config (6 Newton x 30 two-level CG) — the consolidation
gate (VERDICT r4 item 3): the general step must match the specialized one's
wall time and residual before make_sharded_newton_step becomes a wrapper."""
import sys, time
sys.path.insert(0, ".")
from dolfinx_materials_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.fem import (DirichletBC, Function, FunctionSpace,
    create_unit_square, locate_dofs_geometrical)
from dolfinx_materials_tpu.fem.bc import combine_bcs
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
from dolfinx_materials_tpu.models import (LinearElasticIsotropic, VoceHardening,
    vonMisesIsotropicHardening)
from dolfinx_materials_tpu.parallel import (device_mesh,
    make_sharded_newton_step, make_sharded_newton_step_general)

el = LinearElasticIsotropic(70e3, 0.3)
hard = VoceHardening(350.0, 500.0, 1e3)
mat = Material(vonMisesIsotropicHardening(el, hard))
mesh = create_unit_square(64, 64, "quad")
V = FunctionSpace(mesh, 1, (2,))
qmap = QuadratureMap(V, 2, mat)
qmap.register_gradient("Strain", mandel_strain_2d())
left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0), 0)
bot = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0), 1)
right = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1), 0)
bcs = [DirichletBC(left, 0.0), DirichletBC(bot, 0.0),
       DirichletBC(right, 2 * 350.0 / 70e3)]
prob = NonlinearMaterialProblem(qmap, Function(V), bcs=bcs)
mask, vals = combine_bcs(bcs, V.num_dofs)
mask, vals = jnp.asarray(mask), jnp.asarray(vals, jnp.float32)
u0 = jnp.zeros(V.num_dofs, jnp.float32)

def timeit(fn, *args):
    out = fn(*args)
    float(jnp.sum(out[0]))
    best = np.inf
    for _ in range(6):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0]))
        best = min(best, time.perf_counter() - t0)
    return best, out

# --- specialized ----------------------------------------------------------
stepA, padA = make_sharded_newton_step(
    qmap, prob, device_mesh(1), n_newton=6, n_cg=30, pc="two_level")
stA = padA(mat.data_manager.s0.internal)
tA, outA = timeit(stepA, u0, stA, mask, vals, 0.0)
print(f"specialized: {tA*1e3:7.1f} ms  |R| = {float(outA[2]):.3e}")

# --- general + stencil ----------------------------------------------------
stepB, padB = make_sharded_newton_step_general(
    prob, device_mesh(1), n_newton=6, n_cg=30, pc="two_level", rtol=1e-6)
stB = padB([mat.data_manager.s0.internal])
tB, outB = timeit(stepB, u0, stB, mask, vals, 0.0)
print(f"general:     {tB*1e3:7.1f} ms  |R| = {float(outB[2]):.3e}")
du = float(jnp.max(jnp.abs(outA[0] - outB[0])))
print(f"max |uA - uB| = {du:.3e}   ratio t_general/t_specialized = {tB/tA:.3f}")
