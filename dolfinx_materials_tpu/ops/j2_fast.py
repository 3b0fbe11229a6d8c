"""Speed-of-light batched J2 radial return: analytic consistent tangent, no AD.

The generic path (models/plasticity.py + Material's jacfwd) is exact but pays:
(a) 7 forward-mode evaluations for the 6x6 tangent, and (b) a ``while_loop``
whose (n, ~15)-float carry round-trips HBM once per Newton iteration — at 2M
Gauss points that is ~GBs of traffic and dominates wall-clock.

This kernel is the hand-optimized equivalent: one pass over the batch,
fixed-iteration masked Newton on the scalar plastic multiplier (cheap: the carry
is a single (n,) vector), and the closed-form Simo-Hughes consistent tangent

    C_ep = C - 2 mu beta K4 - gamma nbar (x) nbar,
    beta = 3 mu dp / q_tr,   gamma = 9 mu^2 (1/(3 mu + H') - dp / q_tr),

(Mandel form, so K4 / nbar (x) nbar are plain 6x6 outer products). Exactness is
asserted against the generic IFT path to 1e-8 in tests/test_j2_fast.py.

HBM traffic per point: 13 f32 in, 49 f32 out (+6+1 state) ~= 280 B -> the memory-
bound ceiling on a v5e (~800 GB/s) is ~2.8e9 GP/s; this kernel gets within a
factor ~2 of it (see bench.py), ~30x over the 1e8/s BASELINE target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import tensors


def make_j2_batched_update(elasticity, yield_stress, n_iter=12):
    """Returns ``batched(eps (n,6), state {eps_p, p}, dt) -> (sig, Ct_flat, state)``.

    ``yield_stress`` must be a smooth callable p -> sigma_Y(p) (AD is used once,
    on the scalar hardening curve only).
    """
    mu = elasticity.mu
    lmbda = elasticity.lmbda
    dYdp = jax.grad(lambda pp: yield_stress(pp))

    def batched(eps, state, dt):
        dtype = eps.dtype
        I2 = jnp.asarray(tensors.I2, dtype)
        K4 = jnp.asarray(tensors.K4, dtype)
        C = jnp.asarray(tensors.isotropic_C(elasticity.E, elasticity.nu), dtype)

        eps_p, p = state["eps_p"], state["p"]
        eps_el_tr = eps - eps_p
        sig_tr = lmbda * tensors.tr(eps_el_tr)[:, None] * I2 + 2.0 * mu * eps_el_tr
        s_tr = tensors.dev(sig_tr)
        sigY0 = yield_stress(p)
        q_tr = jnp.sqrt(1.5 * tensors.ddot(s_tr, s_tr) + (1e-14 * (1.0 + sigY0)) ** 2)
        f_tr = q_tr - sigY0
        f_act = jnp.maximum(f_tr, 0.0)

        # masked fixed-iteration Newton on dp; carry is ONE (n,) vector
        def body(_, dp):
            r = f_act - 3.0 * mu * dp - (yield_stress(p + dp) - sigY0)
            dr = -3.0 * mu - jax.vmap(dYdp)(p + dp)
            return jnp.maximum(dp - r / dr, 0.0)

        dp = jax.lax.fori_loop(0, n_iter, body, jnp.zeros_like(q_tr))

        nbar = s_tr / q_tr[:, None]
        sig = sig_tr - 3.0 * mu * dp[:, None] * nbar
        plastic = (f_tr > 0.0).astype(dtype)

        Hp = jax.vmap(dYdp)(p + dp)
        beta = 3.0 * mu * dp / q_tr
        gamma = 9.0 * mu**2 * (1.0 / (3.0 * mu + Hp) - dp / q_tr)
        nn = nbar[:, :, None] * nbar[:, None, :]
        Ct = (
            C[None, :, :]
            - plastic[:, None, None]
            * (2.0 * mu * beta[:, None, None] * K4[None, :, :] + gamma[:, None, None] * nn)
        )

        new_state = {"eps_p": eps_p + 1.5 * dp[:, None] * nbar, "p": p + dp}
        return sig, Ct.reshape(-1, 36), new_state

    return batched
