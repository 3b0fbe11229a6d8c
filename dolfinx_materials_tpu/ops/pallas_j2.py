"""Fused Pallas TPU kernel for the J2 radial return (stress + state + tangent).

Why a Pallas kernel when ops/j2_fast.py already vectorizes: at multi-million-
point batches the XLA path materializes each elementwise stage to HBM between
fusions, and the fixed-iteration Newton carry round-trips HBM. This kernel keeps
a whole point-tile resident in VMEM: load strains+state once, run the hardening
Newton loop entirely on-chip, emit stress / consistent tangent / new state once.
HBM traffic = exactly inputs + outputs (the speed-of-light bound).

Layout: FEATURE-MAJOR ``(components, n)`` arrays so the point axis lands on the
128-wide lanes (a ``(n, 6)`` layout would waste 122/128 lanes per row). Blocks
are ``(6|36|1, TILE)`` with the component axis on (padded) sublanes.

The math is the Simo-Hughes closed form of ops/j2_fast.py (docstring there);
parity with the generic IFT path is asserted in tests/test_pallas_j2.py via
interpret mode.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from . import tensors


def make_j2_pallas_update(
    elasticity, yield_stress, n_iter=12, tile=2048, interpret=False
):
    """Returns ``update(eps_T (6,n), eps_p_T (6,n), p (1,n)) ->
    (sig_T (6,n), Ct_T (36,n), eps_p_new (6,n), p_new (1,n))``.

    ``n`` must be a multiple of ``tile``. Feature-major layout (see module
    docstring); use :func:`to_feature_major` / :func:`from_feature_major`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mu = float(elasticity.mu)
    lmbda = float(elasticity.lmbda)
    C66 = np.asarray(tensors.isotropic_C(elasticity.E, elasticity.nu)).astype(
        np.float32
    )
    K4 = tensors.K4.astype(np.float32)

    def dY(pp):
        # elementwise derivative of the scalar hardening curve on a vector
        return jax.jvp(yield_stress, (pp,), (jnp.ones_like(pp),))[1]

    def kernel(eps_ref, epsp_ref, p_ref, i2_ref, c_ref, k4_ref,
               sig_ref, ct_ref, epspn_ref, pn_ref):
        eps = eps_ref[:, :]  # (6, T)
        eps_p = epsp_ref[:, :]  # (6, T)
        p = p_ref[0, :]  # (T,)
        dtype = eps.dtype
        I2col = i2_ref[:, :]  # (6, 1)

        eps_el = eps - eps_p
        tr_e = eps_el[0, :] + eps_el[1, :] + eps_el[2, :]
        sig_tr = 2.0 * mu * eps_el + I2col * (lmbda * tr_e)

        m = (sig_tr[0, :] + sig_tr[1, :] + sig_tr[2, :]) / 3.0
        s_tr = sig_tr - I2col * m

        sigY0 = yield_stress(p)
        tiny = (1e-7 * (1.0 + sigY0)) ** 2
        q_tr = jnp.sqrt(1.5 * jnp.sum(s_tr * s_tr, axis=0) + tiny)
        f_tr = q_tr - sigY0
        f_act = jnp.maximum(f_tr, 0.0)

        def body(_, dp):
            r = f_act - 3.0 * mu * dp - (yield_stress(p + dp) - sigY0)
            dr = -3.0 * mu - dY(p + dp)
            return jnp.maximum(dp - r / dr, 0.0)

        dp = jax.lax.fori_loop(0, n_iter, body, jnp.zeros_like(q_tr))

        iq = 1.0 / q_tr
        nbar = s_tr * iq  # (6, T)
        sig = sig_tr - (3.0 * mu) * dp * nbar
        sig_ref[:, :] = sig

        epspn_ref[:, :] = eps_p + (1.5 * dp) * nbar
        pn_ref[0, :] = p + dp

        plastic = jnp.where(f_tr > 0.0, jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype))
        Hp = dY(p + dp)
        beta = (3.0 * mu) * dp * iq * plastic
        gamma = (9.0 * mu * mu) * (1.0 / (3.0 * mu + Hp) - dp * iq) * plastic

        # Ct[6a+b, :] = C[a,b] - 2 mu beta K4[a,b] - gamma nbar_a nbar_b
        Cflat = c_ref[:, :]  # (36, 1)
        K4flat = k4_ref[:, :]  # (36, 1)
        # outer product over the component axis: (36, T)
        nn = (nbar[:, None, :] * nbar[None, :, :]).reshape(36, -1)
        ct_ref[:, :] = Cflat - (2.0 * mu) * beta * K4flat - gamma * nn

    def update(eps_T, eps_p_T, p_row):
        n = eps_T.shape[1]
        assert n % tile == 0, f"n={n} must be a multiple of tile={tile}"
        grid = (n // tile,)

        def spec(rows):
            return pl.BlockSpec(
                (rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            )

        def const_spec(rows):
            return pl.BlockSpec(
                (rows, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
            )

        dtype = eps_T.dtype
        i2c = jnp.asarray(tensors.I2.reshape(6, 1), dtype)
        cc = jnp.asarray(C66.reshape(36, 1), dtype)
        k4c = jnp.asarray(K4.reshape(36, 1), dtype)

        out_shapes = (
            jax.ShapeDtypeStruct((6, n), dtype),
            jax.ShapeDtypeStruct((36, n), dtype),
            jax.ShapeDtypeStruct((6, n), dtype),
            jax.ShapeDtypeStruct((1, n), dtype),
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec(6), spec(6), spec(1), const_spec(6), const_spec(36),
                      const_spec(36)],
            out_specs=(spec(6), spec(36), spec(6), spec(1)),
            out_shape=out_shapes,
            interpret=interpret,
        )(eps_T, eps_p_T, p_row, i2c, cc, k4c)

    return jax.jit(update)


def to_feature_major(eps, eps_p, p):
    """(n,6),(n,6),(n,) -> kernel layout (6,n),(6,n),(1,n)."""
    return eps.T, eps_p.T, p[None, :]


def from_feature_major(sig_T, Ct_T, eps_p_T, p_row):
    """Kernel layout back to (n,6),(n,36),(n,6),(n,)."""
    return sig_T.T, Ct_T.T, eps_p_T.T, p_row[0]
