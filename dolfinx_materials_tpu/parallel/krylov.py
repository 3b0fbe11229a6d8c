"""Krylov building blocks shared by the fused step builders.

Split out of sharding.py (VERDICT r4 item 3): the preconditioned BiCGStab
used by the blocked monolithic step and the SPD-preserving node-block
inverse used by every block-Jacobi smoother.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pbicgstab(Av, b, M, maxiter, tol, atol=0.0):
    """Left-preconditioned BiCGStab as a plain ``lax.while_loop``.

    Same algorithm (and stopping rule: |r|^2 <= max(tol*|b|, atol)^2) as
    ``jax.scipy.sparse.linalg.bicgstab``, but WITHOUT the
    ``lax.custom_linear_solve`` wrapper — that wrapper eagerly transposes the
    matvec jaxpr, and the banded lane-gather Pallas kernels inside the fused
    steps' matvecs have no transpose rule (the CPU oracle path does, which is
    why this only bites on TPU). Breakdown (rho or omega ~ 0) exits early;
    the caller's nonfinite guard handles the rest."""
    x0 = jnp.zeros_like(b)
    r0 = b
    bs = jnp.maximum(tol * _norm2(b), atol) ** 2
    eps = jnp.asarray(jnp.finfo(b.dtype).eps, b.dtype)

    def cond(st):
        x, r, rhat, alpha, omega, rho, p, q, k = st
        return (jnp.vdot(r, r).real > bs) & (k < maxiter) & (jnp.abs(rho) > 0)

    def body(st):
        x, r, rhat, alpha, omega, rho, p, q, k = st
        rho_ = jnp.vdot(rhat, r)
        beta = (rho_ / jnp.where(rho == 0, eps, rho)) * (
            alpha / jnp.where(omega == 0, eps, omega)
        )
        p_ = r + beta * (p - omega * q)
        phat = M(p_)
        q_ = Av(phat)
        denom = jnp.vdot(rhat, q_)
        alpha_ = rho_ / jnp.where(denom == 0, eps, denom)
        s = r - alpha_ * q_
        shat = M(s)
        t = Av(shat)
        tt = jnp.vdot(t, t)
        omega_ = jnp.vdot(t, s) / jnp.where(tt == 0, eps, tt)
        x_ = x + alpha_ * phat + omega_ * shat
        r_ = s - omega_ * t
        return (x_, r_, rhat, alpha_, omega_, rho_, p_, q_, k + 1)

    one = jnp.asarray(1.0, b.dtype)
    st = (x0, r0, r0, one, one, one, x0, x0, 0)
    x, *_ = jax.lax.while_loop(cond, body, st)
    return x


def _norm2(v):
    return jnp.sqrt(jnp.vdot(v, v).real)


def _sym_block_inv(Bm, eye):
    """SPD-preserving inverse of the (n, ncomp, ncomp) node blocks of the
    Jacobi smoother.

    A plain f32 ``jnp.linalg.inv`` of near-incompressible tangent blocks
    (K/mu ~ 2500, e.g. the Ogden K=1e9 protocol) returns inverses whose
    asymmetry/indefiniteness breaks CG's M-SPD requirement — measured on the
    P2-tet bench protocol the fused step DIVERGED from load step 3 (|R| ->
    1e19) while scalar Jacobi converged. Two standard stabilizations fix it:

    - Jacobi pre-scaling: invert ``D^-1/2 B D^-1/2`` (condition bounded by
      the block's internal coupling, not its absolute scale), then unscale;
    - explicit symmetrization of both the scaled block and the result (the
      exact block is symmetric; assembly round-off is not).
    """
    d = jnp.abs(jnp.einsum("naa->na", Bm))
    s = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-30))
    Bs = Bm * s[:, :, None] * s[:, None, :]
    Bs = 0.5 * (Bs + jnp.swapaxes(Bs, 1, 2))
    Binv = jnp.linalg.inv(Bs)
    Binv = 0.5 * (Binv + jnp.swapaxes(Binv, 1, 2))
    return Binv * s[:, :, None] * s[:, None, :]
