"""Dense-solver microbenchmark at the tet-P2 benchmark size (14739 dofs):
can the v5e form a dense inverse/Cholesky of the scaled tangent fast enough
to replace truncated CG? Temporary experiment driver."""
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

# SPD-ish test matrix (diagonally dominant so cholesky succeeds)
A_np = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
A_np = A_np @ A_np.T + 4.0 * np.eye(n, dtype=np.float32)
A = jnp.asarray(A_np)
b = jnp.asarray(rng.standard_normal(n).astype(np.float32))


def timeit(label, fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{label:36s} {best*1e3:9.1f} ms", flush=True)
    return best


chol = jax.jit(lambda M: jnp.linalg.cholesky(M))
timeit("cholesky", lambda: chol(A))
L = chol(A)
jax.block_until_ready(L)
# correctness spot check on a 512-slice
err = np.abs(
    np.asarray(L[:512] @ L[:512].T)[:, :512] - A_np[:512, :512]
).max()
print(f"cholesky LL^T err (512 block): {err:.2e}", flush=True)


@jax.jit
def chol_inv(A):
    L = jnp.linalg.cholesky(A)
    Linv = jax.scipy.linalg.solve_triangular(
        L, jnp.eye(A.shape[0], dtype=A.dtype), lower=True
    )
    return Linv.T @ Linv


timeit("cholesky -> inverse", lambda: chol_inv(A))


@jax.jit
def mv(Ai, v):
    return Ai @ v


Ai = chol_inv(A)
jax.block_until_ready(Ai)
# chained matvec loop (dispatch-free)
K = 100


@jax.jit
def mv_loop(v):
    def body(i, c):
        return Ai @ c * (1.0 / 4.0)

    return jax.lax.fori_loop(0, K, body, v)


out = mv_loop(b)
jax.block_until_ready(out)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    jax.block_until_ready(mv_loop(b))
    best = min(best, (time.perf_counter() - t0) / K)
print(f"{'dense matvec (in-loop)':36s} {best*1e3:9.3f} ms", flush=True)

# accuracy of the f32 inverse as a solver
x = Ai @ b
r = np.asarray(A_np @ np.asarray(x) - np.asarray(b))
print(f"inverse-solve rel residual: "
      f"{np.linalg.norm(r)/np.linalg.norm(np.asarray(b)):.2e}", flush=True)

# dense assembly: scatter 3072 x 30 x 30 element entries into the dense K
ne, ndl = 3072, 30
dm = rng.integers(0, n, (ne, ndl)).astype(np.int32)
dm_j = jnp.asarray(dm)
K_e = jnp.asarray(rng.standard_normal((ne, ndl, ndl)).astype(np.float32))


@jax.jit
def dense_assemble(K_e):
    idx = (dm_j[:, :, None] * n + dm_j[:, None, :]).ravel()
    return jnp.zeros(n * n, jnp.float32).at[idx].add(K_e.ravel()).reshape(n, n)


timeit("dense assembly (scatter-add)", lambda: dense_assemble(K_e))
