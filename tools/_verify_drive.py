"""Verify-skill library-surface drive (TPU): plastic uniaxial, solve_adaptive
cutback, fused sharded step parity, checkpoint roundtrip."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp

t0 = time.time()
from dolfinx_materials_tpu import (
    Material, QuadratureMap, NonlinearMaterialProblem,
)
from dolfinx_materials_tpu.solvers import solve_adaptive
from dolfinx_materials_tpu.models import (
    LinearElasticIsotropic, vonMisesIsotropicHardening, VoceHardening,
)
from dolfinx_materials_tpu.fem import (
    DirichletBC, Function, FunctionSpace, create_unit_square,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.bc import combine_bcs
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
from dolfinx_materials_tpu.parallel import device_mesh, make_sharded_newton_step
print(f"[{time.time()-t0:.0f}s] imports ok, backend={jax.default_backend()}", flush=True)

E, nu, sig0 = 70e3, 0.3, 350.0
def mk():
    mat = Material(vonMisesIsotropicHardening(
        LinearElasticIsotropic(E, nu), VoceHardening(sig0, 100.0, 10.0)))
    mesh = create_unit_square(8, 8)
    V = FunctionSpace(mesh, degree=1, shape=(2,))
    qmap = QuadratureMap(V, 2, mat)
    qmap.register_gradient(mat.gradient_names[0], mandel_strain_2d())
    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0.0), 0)
    bot = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0.0), 1)
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1.0), 0)
    bc_r = DirichletBC(right, 0.0)
    bcs = [DirichletBC(left, 0.0), DirichletBC(bot, 0.0), bc_r]
    prob = NonlinearMaterialProblem(qmap, Function(V), bcs=bcs)
    return mat, qmap, V, bcs, bc_r, prob

# ---- plastic uniaxial J2 on TPU ------------------------------------------
mat, qmap, V, bcs, bc_r, prob = mk()
eyy = 2 * sig0 / E
bc_r.set(eyy)
conv, it = prob.solve()
p = np.asarray(mat.data_manager.s1.internal["p"])
assert conv and p.max() > 0, (conv, it, p.max())
print(f"[{time.time()-t0:.0f}s] plastic uniaxial: conv in {it} its, p_max={p.max():.2e}", flush=True)
u_host = np.asarray(prob.u.x).copy()

# ---- solve_adaptive with oversized first step ------------------------------
mat2, qmap2, V2, bcs2, bc_r2, prob2 = mk()
accepted = solve_adaptive(prob2, lambda t: bc_r2.set(t), 4 * sig0 / E, nsteps0=1)
assert len(accepted) >= 1 and np.isclose(accepted[-1], 4 * sig0 / E)
print(f"[{time.time()-t0:.0f}s] solve_adaptive: {len(accepted)} accepted steps (cutback ok)", flush=True)

# ---- fused sharded step vs host ------------------------------------------
mat3, qmap3, V3, bcs3, bc_r3, prob3 = mk()
step, _ = make_sharded_newton_step(qmap3, prob3, device_mesh(1), n_newton=12, n_cg=150)
bc_r3.set(eyy)
mask, vals = combine_bcs(bcs3, V3.num_dofs)
u = jnp.zeros(V3.num_dofs, jnp.float32)
st = jax.tree.map(jnp.asarray, mat3.data_manager.s0.internal)
u, st, rn = step(u, st, jnp.asarray(mask), jnp.asarray(vals), 0.0)
assert st["p"].shape[0] == qmap3.num_points, (st["p"].shape, qmap3.num_points)
err = np.abs(np.asarray(u) - u_host).max() / max(np.abs(u_host).max(), 1e-30)
assert err < 3e-4, err
print(f"[{time.time()-t0:.0f}s] fused step: |R|={float(rn):.2e}, vs host disp err={err:.1e}", flush=True)

# ---- checkpoint roundtrip -------------------------------------------------
from dolfinx_materials_tpu.checkpoint import save_state, load_state
import tempfile, os
with tempfile.TemporaryDirectory() as d:
    pth = os.path.join(d, "ck.npz")
    save_state(pth, qmap, extra={"step": np.asarray(3)})
    extra = load_state(pth, qmap)
    assert int(extra["step"]) == 3
print(f"[{time.time()-t0:.0f}s] checkpoint roundtrip ok")
print("VERIFY-DRIVE: ALL OK")
