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

    from dolfinx_materials_tpu.ops.pallas_j2 import make_j2_pallas_update

    el = LinearElasticIsotropic(70e3, 0.3)
    hard = VoceHardening(350.0, 500.0, 1e3)

    n = 1 << 21  # 2M Gauss points, feature-major kernel layout
    rng = np.random.default_rng(0)
    eps_T = jnp.asarray((rng.normal(size=(6, n)) * 2e-2).astype(np.float32))
    epsp_T = jnp.zeros((6, n), jnp.float32)
    p_row = jnp.zeros((1, n), jnp.float32)
    # tile/iteration tuning on v5e: 16384-lane tiles keep the whole working set
    # streaming through VMEM; 8 Newton iterations are converged to f32 epsilon
    # (verified vs 20 iterations: relative diffs ~1e-9)
    update = make_j2_pallas_update(el, hard, tile=16384, n_iter=8)

    # The measurement runs K chained updates INSIDE one jit (every iteration's
    # inputs depend on the previous outputs, so nothing can be elided or
    # overlapped), and times K2 vs K1 differentially: per-dispatch/tunnel
    # overhead cancels, leaving pure device throughput.
    # K is a TRACED loop bound (fori_loop lowers to while_loop): ONE compile
    # serves every K, keeping bench wall-clock bounded on slow remote compiles.
    @jax.jit
    def loop(eT, epT, pr, K):
        def body(i, carry):
            e, ep, pp = carry
            sig, Ct, epn, pn = update(e, ep, pp)
            # fold outputs back into the chain (full data dependence)
            e = eps_T + 1e-9 * Ct[:6] + 1e-9 * Ct[30:] + 1e-6 * sig
            return (e, epn, pn)

        return jax.lax.fori_loop(0, K, body, (eT, epT, pr))

    def timed(K, reps=3):
        out = loop(eps_T, epsp_T, p_row, K)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(eps_T, epsp_T, p_row, K)
            s = float(jnp.sum(out[0]))  # host-sync on a scalar
            best = min(best, time.perf_counter() - t0)
        return best

    K1, K2 = 2, 22
    try:
        t1, t2 = timed(K1), timed(K2)
        dt = (t2 - t1) / (K2 - K1)
    except Exception:
        # fallback: single-loop timing (includes per-dispatch overhead, i.e. a
        # conservative lower bound) so the driver always gets a result line
        dt = timed(K1) / K1

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
