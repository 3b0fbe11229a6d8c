"""Measure the f64 evaluate-path pieces of the mixed-precision tet step:
Ogden constitutive update (f64 vs f32, flux-only vs full tangent), and the
f64 scalar-gather residual assembly. Temporary experiment driver."""
import sys
import time

sys.path.insert(0, ".")
from dolfinx_materials_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import importlib.util as ilu

spec = ilu.spec_from_file_location("ogden_demo", "demos/ogden_block_tpu.py")
mod = ilu.module_from_spec(spec)
spec.loader.exec_module(mod)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
mat, qmap, V, bcs, bc_top = mod.build(N, "tetrahedron", 2)
dom = qmap.domain
ndofs = V.num_dofs
dofmap = jnp.asarray(dom.dofmap)
ne, ndl = dofmap.shape
npts = qmap.num_points
print(f"ndofs={ndofs} ne={ne} npts={npts}", flush=True)

rng = np.random.default_rng(0)
beh = mat.behavior


def timeit(label, fn, x, K=50):
    loop = jax.jit(
        lambda v: jax.lax.fori_loop(0, K, lambda i, c: fn(c), v)
    )
    out = loop(x)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:40s} {best*1e3:8.3f} ms", flush=True)
    return best


for dt_ in (jnp.float32, jnp.float64):
    F = np.tile(np.eye(3).reshape(-1), (npts, 1)) + 1e-3 * rng.standard_normal(
        (npts, 9)
    )
    Fv = jnp.asarray(F, dt_)

    def flux_only(v):
        out = mat.batched_flux_update(v, {}, {}, 0.0)
        pk1 = out[0] if isinstance(out, tuple) else out
        return v + 1e-12 * pk1.astype(v.dtype)

    def full_tan(v):
        pk1, Ct, st = mat.batched_constitutive_update(v, {}, {}, 0.0)
        return v + 1e-12 * pk1.astype(v.dtype) + 1e-15 * Ct[:, :9].astype(v.dtype)

    nm = dt_.__name__ if hasattr(dt_, "__name__") else str(dt_)
    try:
        timeit(f"ogden flux-only {jnp.dtype(dt_).name} ({npts} pts)", flux_only, Fv)
    except Exception as e:
        print(f"flux {jnp.dtype(dt_).name} failed: {type(e).__name__} {e}",
              flush=True)
    try:
        timeit(f"ogden full-tangent {jnp.dtype(dt_).name}", full_tan, Fv)
    except Exception as e:
        print(f"full {jnp.dtype(dt_).name} failed: {type(e).__name__} {e}",
              flush=True)

# f64 scalar-gather residual assembly: gather u -> element residual shape
# (ne, ndl) -> scatter-add (this is the mixed path's f64 residual assembly)
for dt_ in (jnp.float32, jnp.float64):
    u = jnp.asarray(rng.standard_normal(ndofs), dt_)
    r_e = jnp.asarray(rng.standard_normal((ne, ndl)), dt_)

    def gather_scatter(v):
        ue = v[dofmap]  # scalar gather
        y = jnp.zeros_like(v).at[dofmap.ravel()].add(
            (ue * 1e-6 + r_e).ravel()
        )
        return y

    timeit(f"scalar gather+scatter {jnp.dtype(dt_).name}", gather_scatter, u)

# the dense per-element residual integrand (B^T sig) in f64: einsum over
# quadrature points, the actual residual_cells work
nq = npts // ne
dNdx = jnp.asarray(rng.standard_normal((ne, nq, ndl // 3, 3)), jnp.float64)
sig = jnp.asarray(rng.standard_normal((ne, nq, 3, 3)), jnp.float64)
w = jnp.asarray(rng.standard_normal((ne, nq)), jnp.float64)


def integrand(v):
    r = jnp.einsum("eqad,eqcd,eq->eac", dNdx, sig, w).reshape(ne, ndl)
    return v + 1e-12 * r.sum() * jnp.ones_like(v)


timeit("residual integrand einsum f64", integrand,
       jnp.asarray(rng.standard_normal(ndofs), jnp.float64))
