"""Batched small-system Newton solvers with implicit-function-theorem derivatives.

This is the rebuild's answer to the reference's two tangent mechanisms:

- the jaxmat path differentiates *through* the local update with ``jacfwd``
  (reference: dolfinx_materials/jaxmat.py:147-155) relying on jaxmat/optimistix
  implicit diff ("custom differentiation using the implicit theorem",
  reference docs/intro.md:128-132);
- the MFront path gets analytic consistent tangents from C++ codegen.

Here every local nonlinear solve goes through ``jax.lax.custom_root``: the forward
pass is a fixed-upper-bound Newton iteration with per-point convergence masking
(TPU/XLA-friendly: static shapes, ``lax.while_loop`` with an all-points predicate),
and derivatives come from one extra linear solve per tangent direction — never from
unrolling the loop. ``jax.jacfwd`` of a constitutive update that calls these solvers
therefore yields the exact consistent tangent at O(n_grad) linear-solve cost.
"""

import jax
import jax.numpy as jnp
from jax import lax


def _dense_solve(J, r):
    """Solve J dx = r for small dense J (n<=~24). Seam for a Pallas batched solver."""
    return jnp.linalg.solve(J, r)


def newton_solve(resid_fn, x0, args=(), tol=1e-10, max_iter=50, max_backtracks=12):
    """Solve ``resid_fn(x, *args) = 0`` for small dense x ``(n,)`` by damped Newton
    (backtracking on |r| — required for nearly piecewise-linear residuals such as
    conic yield surfaces, where full steps oscillate).

    Differentiable w.r.t. ``args`` (and any closure of ``resid_fn``) via the implicit
    function theorem — the iteration itself is never differentiated, so the damping
    has zero effect on the consistent tangents.

    Designed for use *per Gauss point under vmap*: all control flow is
    ``lax.while_loop`` whose predicates vectorize, and the state update is masked
    per point so converged points are fixed points.

    Returns ``(x, converged)``.
    """
    x0 = jnp.asarray(x0)

    def f(x):
        return resid_fn(x, *args)

    def solve(f_, x_init):
        def cond(carry):
            _, r, it, done = carry
            return jnp.logical_and(~done, it < max_iter)

        def body(carry):
            x, r, it, done = carry
            J = jax.jacfwd(f_)(x)
            dx = _dense_solve(J, r)
            r_norm = jnp.linalg.norm(r)

            def ls_cond(ls):
                alpha, rn, k = ls
                bad = jnp.logical_or(~jnp.isfinite(rn), rn >= r_norm)
                return jnp.logical_and(bad, k < max_backtracks)

            def ls_body(ls):
                alpha, _, k = ls
                alpha = 0.5 * alpha
                rn = jnp.linalg.norm(f_(x - alpha * dx))
                return alpha, rn, k + 1

            rn1 = jnp.linalg.norm(f_(x - dx))
            alpha, _, _ = lax.while_loop(ls_cond, ls_body, (1.0, rn1, 0))
            x_new = x - alpha * dx
            r_new = f_(x_new)
            done_new = jnp.linalg.norm(r_new) < tol
            return x_new, r_new, it + 1, done_new

        r0 = f_(x_init)
        done0 = jnp.linalg.norm(r0) < tol
        x, r, it, done = lax.while_loop(cond, body, (x_init, r0, 0, done0))
        return x

    def tangent_solve(g, y):
        # g is the linearization of f at the root; build its matrix and solve.
        J = jax.jacfwd(g)(jnp.zeros_like(y))
        return _dense_solve(J, y)

    x = lax.custom_root(f, x0, solve, tangent_solve)
    r = f(x)
    converged = jnp.linalg.norm(r) < tol
    return x, converged


def scalar_newton_solve(resid_fn, x0, args=(), tol=1e-10, max_iter=50, lower=None):
    """Scalar Newton with IFT derivatives; optional projection ``x >= lower``.

    The projection (e.g. plastic multiplier >= 0) is applied inside the iteration
    only, keeping the fixed point consistent with the unconstrained root when the
    solve is activated behind a yield check.
    """
    x0 = jnp.asarray(x0)

    def f(x):
        return resid_fn(x, *args)

    def solve(f_, x_init):
        def cond(carry):
            _, r, it, done = carry
            return jnp.logical_and(~done, it < max_iter)

        def body(carry):
            x, r, it, done = carry
            dr = jax.grad(f_)(x)
            x_new = x - r / dr
            if lower is not None:
                x_new = jnp.maximum(x_new, lower)
            r_new = f_(x_new)
            done_new = jnp.abs(r_new) < tol
            return x_new, r_new, it + 1, done_new

        r0 = f_(x_init)
        done0 = jnp.abs(r0) < tol
        x, r, it, done = lax.while_loop(cond, body, (x_init, r0, 0, done0))
        return x

    def tangent_solve(g, y):
        return y / g(jnp.ones_like(y))

    x = lax.custom_root(f, x0, solve, tangent_solve)
    converged = jnp.abs(f(x)) < tol
    return x, converged
