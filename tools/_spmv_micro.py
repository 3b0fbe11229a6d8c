"""Microbenchmark the tet-P2 CG-body pieces on the real TPU: banded gather,
element einsum, banded assembly, coarse correct, vdots — finds where the
measured ~2.2 ms/CG-iteration goes. Temporary experiment driver."""
import sys
import time

sys.path.insert(0, ".")
from dolfinx_materials_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

import importlib.util as ilu

spec = ilu.spec_from_file_location("ogden_demo", "demos/ogden_block_tpu.py")
mod = ilu.module_from_spec(spec)
spec.loader.exec_module(mod)

from dolfinx_materials_tpu.parallel.sharding import _coord_agg_modes, _p1_coarse

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
mat, qmap, V, bcs, bc_top = mod.build(N, "tetrahedron", 2)
dom = qmap.domain
ndofs = V.num_dofs
ne, ndl = np.asarray(dom.dofmap).shape
print(f"ndofs={ndofs} ne={ne} ndl={ndl} banded={dom.banded_active}",
      flush=True)

rng = np.random.default_rng(0)
K_e = jnp.asarray(rng.standard_normal((ne, ndl, ndl)).astype(np.float32))
u = jnp.asarray(rng.standard_normal(ndofs).astype(np.float32))
dofmap = jnp.asarray(dom.dofmap)


def timeit(label, fn, *args, K=200):
    loop = jax.jit(
        lambda x: jax.lax.fori_loop(
            0, K, lambda i, c: fn(c, *args) if args else fn(c), x
        )
    )
    out = loop(u)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(u)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:34s} {best*1e3:8.3f} ms/it", flush=True)
    return best


# 1. full matvec: gather -> einsum -> assemble
def matvec(v):
    ue = dom.gather(v)
    ye = jnp.einsum("eij,ej->ei", K_e, ue)
    return dom.assemble_vec(ye) if hasattr(dom, "assemble_vec") else dom.scatter_add(ye)


# look up the actual assembly entry point
asm_names = [n for n in dir(dom) if "assemb" in n or "scatter" in n]
print("asm candidates:", asm_names, flush=True)


def assemble(ye):
    return dom._banded_take("asm", ye.T.reshape(-1))


def mv(v):
    ue = dom.gather(v)
    ye = jnp.einsum("eij,ej->ei", K_e, ue)
    y = assemble(ye)
    return y[:ndofs] if y.shape[0] != ndofs else y


timeit("gather only", lambda v: dom.gather(v).sum() * 0 + v)
timeit("gather+einsum", lambda v: jnp.einsum(
    "eij,ej->ei", K_e, dom.gather(v)).sum() * 0 + v)
timeit("full matvec", lambda v: mv(v) * 1.0)

# scalar-gather matvec for comparison
def mv_scalar(v):
    ue = v[dofmap]
    ye = jnp.einsum("eij,ej->ei", K_e, ue)
    return jnp.zeros_like(v).at[dofmap.ravel()].add(ye.ravel())


timeit("scalar-gather matvec", lambda v: mv_scalar(v))

# 2. box-RBM coarse correct
ncomp = 3
nnodes = ndofs // ncomp
ncoarse, agg, W = _coord_agg_modes(V, 8, modes="rbm")
nmodes = W.shape[2]
agg_j = jnp.asarray(agg)
W_j = jnp.asarray(W)
Ai = jnp.asarray(rng.standard_normal((ncoarse, ncoarse)).astype(np.float32))


def coarse(r):
    rn = r.reshape(nnodes, ncomp)
    rm = jnp.einsum("nc,ncm->nm", rn, W_j)
    rc = jax.ops.segment_sum(rm, agg_j, num_segments=ncoarse // nmodes).ravel()
    wc = Ai @ rc
    wcn = wc.reshape(-1, nmodes)[agg_j]
    return jnp.einsum("ncm,nm->nc", W_j, wcn).ravel()


timeit("box-rbm coarse correct", lambda v: coarse(v))

# 3. p1 coarse correct
nc1, parents, pw, vid, Wp1 = _p1_coarse(V)
pj = jnp.asarray(parents)
pwj = jnp.asarray(pw)
nverts = nc1 // ncomp
Ai1 = jnp.asarray(rng.standard_normal((nc1, nc1)).astype(np.float32))


def coarse_p1(r):
    rn = r.reshape(nnodes, ncomp)
    c0 = jax.ops.segment_sum(rn * pwj[:, :1], pj[:, 0], num_segments=nverts)
    c1 = jax.ops.segment_sum(rn * pwj[:, 1:], pj[:, 1], num_segments=nverts)
    wc = Ai1 @ (c0 + c1).ravel()
    wn = wc.reshape(nverts, ncomp)
    return (pwj[:, :1] * wn[pj[:, 0]] + pwj[:, 1:] * wn[pj[:, 1]]).ravel()


timeit("p1 coarse correct", lambda v: coarse_p1(v))

# 4. vdot + axpy triad (CG bookkeeping, ~5 per it)
timeit("5x (vdot+axpy)", lambda v: sum(
    jnp.vdot(v, v) * 1e-20 for _ in range(5)) + v)

# 5. everything combined (1 CG it worth)
def cg_it(v):
    y = mv(v)
    z = y + coarse(y)
    return z * (1.0 + jnp.vdot(y, z) * 1e-30)


timeit("composed cg-iteration", lambda v: cg_it(v))


# ---- replicate the REAL mixed cg_body 1:1: masks, identity smoother,
# coarse, 2 vdots, axpys, inside (a) fori_loop and (b) while_loop ---------
mask = jnp.asarray(rng.random(ndofs) < 0.05)


def cg_body_real(cg):
    x, r, z, p, rz, k = cg
    v0 = jnp.where(mask, 0.0, p)
    ue = dom.gather(v0)
    ye = jnp.einsum("eij,ej->ei", K_e, ue)
    y = assemble(ye)
    y = y[:ndofs] if y.shape[0] != ndofs else y
    Ap = jnp.where(mask, p, y)
    den = jnp.vdot(p, Ap)
    alpha = jnp.where(jnp.abs(den) > 1e-30, rz / den, 0.0)
    x = x + alpha * p
    r = r - alpha * Ap
    z = r + coarse(jnp.where(mask, 0.0, r))
    rz_new = jnp.vdot(r, z)
    beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
    return (x, r, z, p * beta + z, rz_new, k + 1)


def run_fori(v, K=200):
    init = (jnp.zeros_like(v), v, v, v, jnp.vdot(v, v), 0)
    out = jax.lax.fori_loop(0, K, lambda i, c: cg_body_real(c), init)
    return out[0]


def run_while(v, K=200):
    init = (jnp.zeros_like(v), v, v, v, jnp.vdot(v, v), 0)
    out = jax.lax.while_loop(
        lambda c: jnp.logical_and(c[5] < K, jnp.abs(c[4]) > 1e-30),
        cg_body_real, init,
    )
    return out[0]


for label, fn in (("REAL cg_body fori x200", run_fori),
                  ("REAL cg_body while x200", run_while)):
    jitted = jax.jit(fn)
    out = jitted(u)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jitted(u))
        best = min(best, (time.perf_counter() - t0) / 200)
    print(f"{label:34s} {best*1e3:8.3f} ms/it", flush=True)
