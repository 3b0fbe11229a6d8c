"""Headline benchmark: J2 return-mapping Gauss-point constitutive updates/sec.

The BASELINE.json north-star metric: >= 1e8 J2 (von Mises + Voce) return-mapping
updates/sec per chip, each update producing stress, new state AND the 6x6
consistent tangent (the per-Newton-iteration workload, reference hot path
dolfinx_materials/jaxmat.py:147-155). ``vs_baseline`` = value / 1e8.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

import json
import time

import numpy as np

BASELINE_GP_PER_S = 1e8


def main():
    import jax
    import jax.numpy as jnp

    from dolfinx_materials_tpu import Material
    from dolfinx_materials_tpu.models import (
        LinearElasticIsotropic,
        VoceHardening,
        vonMisesIsotropicHardening,
    )

    behavior = vonMisesIsotropicHardening(
        LinearElasticIsotropic(70e3, 0.3), VoceHardening(350.0, 500.0, 1e3)
    )
    mat = Material(behavior)
    assert mat._fast_update is not None

    n = 1 << 21  # 2M Gauss points
    rng = np.random.default_rng(0)
    eps = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32) * 2e-2)
    state = {
        "eps_p": jnp.zeros((n, 6), jnp.float32),
        "p": jnp.zeros((n,), jnp.float32),
    }
    update = mat._fast_update

    # The measurement runs K chained updates INSIDE one jit (every iteration's
    # inputs depend on the previous outputs, so nothing can be elided or
    # overlapped), and times K2 vs K1 differentially: per-dispatch/tunnel
    # overhead cancels, leaving pure device throughput.
    def make_loop(K):
        @jax.jit
        def loop(eps, st):
            def body(i, carry):
                e, st = carry
                flux, Ct, st = update(e, st, 0.0)
                # fold outputs back into the chain (full data dependence)
                e = eps + 1e-9 * Ct.reshape(-1, 6, 6).sum(-1) + 1e-6 * flux
                return (e, st)

            e, st = jax.lax.fori_loop(0, K, body, (eps, st))
            flux, Ct, st = update(e, st, 0.0)  # final tangent written out
            return flux, Ct, st

        return loop

    def timed(K, reps=3):
        loop = make_loop(K)
        out = loop(eps, state)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(eps, state)
            s = float(jnp.sum(out[0]))  # host-sync on a scalar
            best = min(best, time.perf_counter() - t0)
        return best

    K1, K2 = 4, 36
    t1, t2 = timed(K1), timed(K2)
    dt = (t2 - t1) / (K2 - K1)

    gp_per_s = n / dt
    print(
        json.dumps(
            {
                "metric": "j2_return_map_gauss_point_updates_per_s",
                "value": float(gp_per_s),
                "unit": "GP/s",
                "vs_baseline": float(gp_per_s / BASELINE_GP_PER_S),
            }
        )
    )


if __name__ == "__main__":
    main()
