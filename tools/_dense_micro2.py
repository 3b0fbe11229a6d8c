"""Dense Cholesky-as-preconditioner microbenchmark at the tet-P2 size:
cholesky factor time (input-varied, memoization-proof), cho_solve single-RHS
time inside a chained loop, dense assembly scatter. Temporary driver."""
import sys
import time

sys.path.insert(0, ".")
from dolfinx_materials_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 14739
rng = np.random.default_rng(0)

A_np = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
A_np = A_np @ A_np.T + 4.0 * np.eye(n, dtype=np.float32)
A = jnp.asarray(A_np)
b = jnp.asarray(rng.standard_normal(n).astype(np.float32))


@jax.jit
def chol_consume(M, eps):
    L = jnp.linalg.cholesky(M + eps * jnp.eye(n, dtype=M.dtype))
    return L, jnp.sum(L[:, 0])


(L, s0) = chol_consume(A, 0.0)
jax.block_until_ready(s0)
ts = []
for i in range(3):
    t0 = time.perf_counter()
    Li, si = chol_consume(A, 1e-6 * (i + 1))
    float(si)  # force a device->host transfer: block_until_ready may not
    ts.append(time.perf_counter() - t0)
print(f"cholesky (varied input): {min(ts)*1e3:.1f} ms  (all: "
      + " ".join(f"{t*1e3:.1f}" for t in ts) + ")", flush=True)


# cho_solve single RHS, chained (the per-CG-iteration PC apply)
@jax.jit
def cho_solve_loop(L, v):
    def body(i, c):
        y = jax.scipy.linalg.solve_triangular(L, c, lower=True)
        x = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
        return x * 0.25 + v * 1e-9

    return jax.lax.fori_loop(0, 20, body, v)


out = cho_solve_loop(L, b)
jax.block_until_ready(out)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    float(jnp.sum(cho_solve_loop(L, b)))
    best = min(best, (time.perf_counter() - t0) / 20)
print(f"cho_solve 1 RHS (in-loop): {best*1e3:.2f} ms", flush=True)

# accuracy: A x = b via cho_solve
y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
x = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
r = np.asarray(A_np @ np.asarray(x) - np.asarray(b))
print(f"cho_solve rel residual: "
      f"{np.linalg.norm(r)/np.linalg.norm(np.asarray(b)):.2e}", flush=True)

# dense assembly scatter (3072 x 30 x 30 -> n x n)
ne, ndl = 3072, 30
dm = rng.integers(0, n, (ne, ndl)).astype(np.int32)
dm_j = jnp.asarray(dm)
K_e = jnp.asarray(rng.standard_normal((ne, ndl, ndl)).astype(np.float32))


@jax.jit
def dense_assemble(K_e):
    idx = (dm_j[:, :, None] * n + dm_j[:, None, :]).ravel()
    M = jnp.zeros(n * n, jnp.float32).at[idx].add(K_e.ravel()).reshape(n, n)
    return M, jnp.sum(M[0])


M, sm = dense_assemble(K_e)
jax.block_until_ready(sm)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    _, sm = dense_assemble(K_e)
    float(sm)
    best = min(best, time.perf_counter() - t0)
print(f"dense assembly scatter: {best*1e3:.1f} ms", flush=True)
