"""Headline benchmark: J2 return-mapping Gauss-point constitutive updates/sec.

The BASELINE.json north-star metric: >= 1e8 J2 (von Mises + Voce) return-mapping
updates/sec per chip, each update producing stress, new state AND the 6x6
consistent tangent (the per-Newton-iteration workload, reference hot path
dolfinx_materials/jaxmat.py:147-155). ``vs_baseline`` = value / 1e8.

The headline number is produced ONLY after an on-device parity gate: the Pallas
kernel's stress/tangent/state are checked against the independent jnp fast path
(ops/j2_fast.py) on the same backend the timing runs on — the benched kernel and
the validated kernel are the same compiled artifact (VERDICT r1 "bench/parity
split-brain" fix). Secondary metrics ride in the same JSON object:
``factored_gp_per_s`` (the 112 B/point factored-tangent kernel) and the parity
errors themselves.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}.
"""

import json
import time

import numpy as np

BASELINE_GP_PER_S = 1e8


def main():
    import os
    import subprocess
    import sys

    # The axon TPU tunnel can hang INDEFINITELY at backend init (observed
    # 2026-08-17: jax.devices() blocked for 8+ hours). Probe it in a
    # disposable subprocess first so a dead tunnel produces a bounded,
    # parseable failure line instead of a silent driver timeout that loses
    # every metric.
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=240, check=True, capture_output=True,
        )
    except Exception as e:
        print(
            json.dumps(
                {
                    "metric": "j2_return_map_gauss_point_updates_per_s",
                    "value": 0.0,
                    "unit": "GP/s",
                    "vs_baseline": 0.0,
                    "error": "tpu_backend_unreachable_at_bench_time "
                    f"({type(e).__name__})",
                }
            )
        )
        return

    import jax

    # persistent compile cache: the driver's end-of-round run (a fresh
    # process) reuses every kernel compiled here before; also guards against
    # slow remote-compile days
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    import jax.numpy as jnp

    t_bench_start = time.perf_counter()

    from dolfinx_materials_tpu.models import (
        LinearElasticIsotropic,
        VoceHardening,
    )
    from dolfinx_materials_tpu.ops.j2_fast import make_j2_batched_update
    from dolfinx_materials_tpu.ops.pallas_j2 import (
        expand_factored_tangent,
        make_j2_pallas_factored,
        make_j2_pallas_update,
    )

    el = LinearElasticIsotropic(70e3, 0.3)
    hard = VoceHardening(350.0, 500.0, 1e3)

    n = 1 << 21  # 2M Gauss points, feature-major kernel layout
    rng = np.random.default_rng(0)
    eps_T = jnp.asarray((rng.normal(size=(6, n)) * 2e-2).astype(np.float32))
    epsp_T = jnp.zeros((6, n), jnp.float32)
    p_row = jnp.zeros((1, n), jnp.float32)
    # tuning (docs/perf.md): 8192-point tiles, warm-started Newton (seed
    # dp0 = f_act/(3mu + Y'(p)); 4 / 3 unrolled iterations = f32-converged
    # incl. 8-20%-strain steps), slab tangent stores
    update = make_j2_pallas_update(el, hard, tile=8192, n_iter=4)
    upd_fact = make_j2_pallas_factored(el, hard, tile=8192, n_iter=3)

    # ---- on-device parity gate (mixed elastic/plastic batch) ---------------
    ref = jax.jit(make_j2_batched_update(el, hard))
    sig_r, Ct_r, st_r = ref(eps_T.T, {"eps_p": epsp_T.T, "p": p_row[0]}, 0.0)
    sig_scale = float(jnp.max(jnp.abs(sig_r)))

    sig, Ct, epn, pn = update(eps_T, epsp_T, p_row)
    err_sig = float(jnp.max(jnp.abs(sig.T - sig_r))) / sig_scale
    err_Ct = float(jnp.max(jnp.abs(Ct.T - Ct_r.reshape(n, -1)))) / 70e3
    err_p = float(jnp.max(jnp.abs(pn[0] - st_r["p"])))
    assert float(pn.max()) > 1e-3, "parity batch must exercise the plastic branch"
    assert err_sig < 1e-5 and err_Ct < 1e-5 and err_p < 1e-6, (
        f"on-device parity FAILED: sig {err_sig:.2e} Ct {err_Ct:.2e} p {err_p:.2e}"
    )

    sig_f, fac, _, pn_f = upd_fact(eps_T, epsp_T, p_row)
    Ct_f = expand_factored_tangent(el, sig_f, fac)
    err_fact = float(jnp.max(jnp.abs(Ct_f.T - Ct_r.reshape(n, -1)))) / 70e3
    assert err_fact < 1e-5, f"factored-tangent parity FAILED: {err_fact:.2e}"

    # ---- timing -------------------------------------------------------------
    # K chained updates INSIDE one jit (each iteration's inputs depend on the
    # previous outputs: nothing elided/overlapped); differential timing K2 vs K1
    # cancels dispatch/tunnel overhead. K is a TRACED bound: one compile for all
    # K. IMPORTANT: the axon tunnel's block_until_ready is unreliable — a scalar
    # readback (float(jnp.sum(...))) is the only trustworthy sync.
    def make_loop(upd):
        @jax.jit
        def loop(eT, epT, pr, K):
            def body(i, carry):
                e, ep, pp = carry
                sig, X, epn, pn = upd(e, ep, pp)
                e = eps_T + 1e-9 * X[:2].mean(0) + 1e-6 * sig
                return (e, epn, pn)

            return jax.lax.fori_loop(0, K, body, (eT, epT, pr))

        return loop

    def timed_reps(loop, K, reps=4):
        out = loop(eps_T, epsp_T, p_row, K)
        float(jnp.sum(out[0]))  # forced scalar readback = real sync
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(eps_T, epsp_T, p_row, K)
            float(jnp.sum(out[0]))
            ts.append(time.perf_counter() - t0)
        return ts

    def timed(loop, K, reps=4):
        return min(timed_reps(loop, K, reps))

    def gp_per_s(upd, K1=2, K2=22, reps=4):
        """Best-of-``reps`` differential estimate PLUS the per-rep spread
        (VERDICT r4 directive 3: tunnel variance must be recorded, not
        averaged away — the r3 doc-vs-driver factored-J2 discrepancy was
        exactly this). Each rep of the deep loop is paired with the best
        short-loop time; spread = (max-min)/best over the per-rep GP/s."""
        loop = make_loop(upd)
        t1 = timed(loop, K1, reps)
        t2s = timed_reps(loop, K2, reps)
        ests = [n * (K2 - K1) / (t2 - t1) for t2 in t2s if t2 > t1]
        if not ests:  # tunnel noise fallback: single-loop conservative bound
            v = n * K2 / min(t2s)
            return v, {"best_of": reps, "spread_rel": None,
                       "lower_bound": True}
        best = max(ests)
        return best, {
            "best_of": reps,
            "spread_rel": round((max(ests) - min(ests)) / best, 4),
        }

    try:
        full, full_stats = gp_per_s(update)
        fact, fact_stats = gp_per_s(upd_fact)
    except Exception:
        # fallback so the driver always receives a result line
        loop = make_loop(update)
        full = n * 2 / timed(loop, 2)
        fact = 0.0
        full_stats = fact_stats = {"best_of": 0, "spread_rel": None}

    # ---- secondary model-family metrics (guarded: never block the headline) -
    # chained_gp protocol flags (ADVICE r3): when the differential signal is
    # noise-swamped even after deepening the chain, the returned figure is a
    # dispatch-INCLUSIVE lower bound computed by a different protocol; callers
    # record "<metric>_lower_bound": True so BENCH consumers can tell the
    # estimates apart instead of silently comparing apples to oranges.
    chained_gp_lower_bound = {"flag": False}

    def chained_gp(upd, x0, state0, evolve, n_pts, K1=2, K2=8):
        chained_gp_lower_bound["flag"] = False
        @jax.jit
        def loop(x, st, K):
            def body(i, carry):
                xc, stc = carry
                out = upd(xc, stc, 1e-2)
                return evolve(x0, out), out[-1]

            return jax.lax.fori_loop(0, K, body, (x, st))

        def t(K):
            out = loop(x0, state0, K)
            float(jnp.sum(out[0]))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                out = loop(x0, state0, K)
                float(jnp.sum(out[0]))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = t(K1), t(K2)
        dt = t2 - t1
        if dt <= 0.02 * t2:
            # differential signal lost in tunnel dispatch noise (can even go
            # NEGATIVE — observed on the ogden K1=1,K2=4 protocol): deepen the
            # chain once so the kernel time dominates the jitter
            K3 = 4 * K2 - 3 * K1  # 4x the differential span
            t3 = t(K3)
            if t3 - t1 > 0:
                return n_pts * (K3 - K1) / (t3 - t1)
            # still swamped: dispatch-inclusive lower bound, always positive —
            # a DIFFERENT protocol from the differential estimate; flag it
            chained_gp_lower_bound["flag"] = True
            return n_pts * K2 / t2
        return n_pts * (K2 - K1) / dt

    extras = {}

    def over_budget():
        # leave headroom for the driver's own timeout: skip remaining extras
        # once the run has consumed 14 minutes (headline already measured).
        # Extras are ordered by importance: fused step (the global-solve
        # datapoint), then the three END-TO-END reference-benchmark rows
        # (composite / tet-P2 / hex — each cache-warm ~1-2 min, compile-cold
        # minutes; the persistent .jax_cache makes the driver's run warm as
        # long as bench ran once after the last code change), then
        # crystal/fefp/banded/ogden kernel rows (~2-3 min total).
        return time.perf_counter() - t_bench_start > 840.0

    try:
        if over_budget():
            raise TimeoutError
        # fused FEM load step (6 Newton x 150 CG, 64x64 J2 plate) — the
        # one-XLA-program global-solve datapoint (docs/perf.md)
        from dolfinx_materials_tpu import (
            Material as _M2,
            NonlinearMaterialProblem as _NMP,
            QuadratureMap as _QM,
        )
        from dolfinx_materials_tpu.fem import (
            DirichletBC as _BC,
            Function as _Fn,
            FunctionSpace as _FS,
            create_unit_square as _sq,
            locate_dofs_geometrical as _loc,
        )
        from dolfinx_materials_tpu.fem.bc import combine_bcs as _cbc
        from dolfinx_materials_tpu.fem.forms import mandel_strain_2d as _ms2
        from dolfinx_materials_tpu.parallel import (
            device_mesh as _dm,
            make_sharded_newton_step as _mkstep,
        )

        _mat = _M2(
            __import__(
                "dolfinx_materials_tpu.models", fromlist=["x"]
            ).vonMisesIsotropicHardening(el, hard)
        )
        _mesh = _sq(64, 64, "quad")
        _V = _FS(_mesh, 1, (2,))
        _qm = _QM(_V, 2, _mat)
        _qm.register_gradient("Strain", _ms2())
        _l = _loc(_V, lambda x: np.isclose(x[:, 0], 0), 0)
        _b = _loc(_V, lambda x: np.isclose(x[:, 1], 0), 1)
        _r = _loc(_V, lambda x: np.isclose(x[:, 0], 1), 0)
        _bcs = [_BC(_l, 0.0), _BC(_b, 0.0), _BC(_r, 2 * 350.0 / 70e3)]
        _prob = _NMP(_qm, _Fn(_V), bcs=_bcs)
        # the DOCUMENTED configuration (docs/perf.md "Fused FEM load step"):
        # 6 Newton x two-level-preconditioned 30-CG — the config the docs
        # advertise is the config the driver records (VERDICT r2 item 5),
        # with the achieved residual printed alongside the wall time
        _step, _pad = _mkstep(
            _qm, _prob, _dm(1), n_newton=6, n_cg=30, pc="two_level"
        )
        _mask, _vals = _cbc(_bcs, _V.num_dofs)
        _st0 = _pad(_mat.data_manager.s0.internal)
        _u0 = jnp.zeros(_V.num_dofs, jnp.float32)
        _u, _, _rn = _step(_u0, _st0, _mask, _vals, 0.0)
        float(jnp.sum(_u))
        _best = np.inf
        for _ in range(4):
            _t0 = time.perf_counter()
            _u, _, _rn = _step(_u0, _st0, _mask, _vals, 0.0)
            float(jnp.sum(_u))
            _best = min(_best, time.perf_counter() - _t0)
        extras["fused_step_64x64_ms"] = float(_best * 1e3)
        extras["fused_step_residual"] = float(_rn)
        extras["fused_step_config"] = "6newton_x_30cg_two_level" 
    except Exception as e:  # pragma: no cover
        extras["fused_step_64x64_ms"] = f"failed: {type(e).__name__}"

    def _demo_json(script, args, timeout_s):
        """Run a demo's --bench entry in a SUBPROCESS (the mixed-precision
        protocols enable jax_enable_x64, which must not leak into this
        process's f32 kernels) and parse the last stdout line as JSON."""
        import subprocess

        here = os.path.dirname(os.path.abspath(__file__))
        out = subprocess.run(
            [sys.executable, os.path.join(here, "demos", script), "--bench"]
            + [str(a) for a in args],
            cwd=here,
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
        if out.returncode != 0:
            raise RuntimeError(
                f"{script} --bench rc={out.returncode}: "
                f"{out.stderr.strip()[-400:]}"
            )
        return json.loads(out.stdout.strip().splitlines()[-1])

    try:
        if over_budget():
            raise TimeoutError
        # THE reference benchmark (VERDICT r4 directive 1): Ogden matrix +
        # eight quasi-rigid SVK sphere inclusions at E_pen=1e12, P2 tets at
        # the matched coarse element count, 10 load steps to 20% strain —
        # reference total 18.5 s @1 rank / 5.46 s @8 ranks
        # (timing_results.csv). Mixed precision: per-step RELATIVE residuals
        # recorded (f64-honest), not a fixed-budget f32 floor.
        _cj = _demo_json("composite_hyperelasticity_tpu.py", [], 1200)
        extras["ogden3d_composite_solve_10steps_s"] = _cj["composite_10steps_s"]
        extras["ogden3d_composite_rel_R"] = [
            float(f"{r:.3e}") for r in _cj["composite_rel_R"]
        ]
        extras["ogden3d_composite_dofs"] = _cj["composite_dofs"]
        extras["ogden3d_ref_1rank_s"] = 18.5
        extras["ogden3d_ref_8rank_s"] = 5.46
    except Exception as e:  # pragma: no cover
        extras["ogden3d_composite_solve_10steps_s"] = (
            f"failed: {type(e).__name__}"
        )

    try:
        if over_budget():
            raise TimeoutError
        # Homogeneous block at the reference's EXACT discretization (P2 tets,
        # matched coarse count, Keast quadrature, banded engine), mixed
        # precision with per-step relative residuals (VERDICT r4 directive 2).
        _tj = _demo_json("ogden_block_tpu.py", [], 1200)
        extras["ogden3d_tet_p2_solve_10steps_s"] = _tj["tet_p2_10steps_s"]
        extras["ogden3d_tet_p2_rel_R"] = [
            float(f"{r:.3e}") for r in _tj["tet_p2_rel_R"]
        ]
        extras["ogden_K"] = _tj["ogden_K"]  # reference K=6.944e7 (r4 fix)
    except Exception as e:  # pragma: no cover
        extras["ogden3d_tet_p2_solve_10steps_s"] = f"failed: {type(e).__name__}"

    try:
        if over_budget():
            raise TimeoutError
        # Homogeneous P1-hex proxy row (structured stencil, f32, in-process):
        # the engine-speed datapoint, kept for r1-r3 continuity
        import importlib.util as _ilu

        _spec = _ilu.spec_from_file_location(
            "ogden_block_tpu",
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "demos",
                "ogden_block_tpu.py",
            ),
        )
        _ogmod = _ilu.module_from_spec(_spec)
        _spec.loader.exec_module(_ogmod)
        _, _t_og, _rns_og, _rn0s_og = _ogmod.run_10_steps(
            14, n_newton=20, n_cg=100, n_devices=1
        )
        extras["ogden3d_solve_10steps_s"] = float(_t_og)
        extras["ogden3d_final_residual"] = float(_rns_og[-1])
    except Exception as e:  # pragma: no cover
        extras["ogden3d_solve_10steps_s"] = f"failed: {type(e).__name__}"

    try:
        if over_budget():
            raise TimeoutError
        from dolfinx_materials_tpu.models import MericCailletaudCrystalPlasticity
        from dolfinx_materials_tpu.material import Material as _Mat

        beh_c = MericCailletaudCrystalPlasticity()
        mat_c = _Mat(beh_c)
        nc = 1 << 14
        mat_c.set_data_manager(nc)
        eps0 = jnp.asarray(
            (2e-3 * np.random.default_rng(2).standard_normal((nc, 6))).astype(
                np.float32
            )
        )
        stc = mat_c.data_manager.s0.internal
        extras["crystal_gp_per_s"] = float(
            chained_gp(
                beh_c.batched_update, eps0, stc,
                lambda x0, out: x0 + 1e-9 * out[0] + 1e-12 * out[1][:, :6],
                # K2=8 (was 4): the early-exiting crystal Newton made
                # per-step time ~8x smaller, so the differential needs more
                # chained steps to stay above tunnel noise
                nc, K1=1, K2=8,
            )
        )
        if chained_gp_lower_bound["flag"]:
            extras["crystal_gp_per_s_lower_bound"] = True
    except Exception as e:  # pragma: no cover
        extras["crystal_gp_per_s"] = f"failed: {type(e).__name__}"

    try:
        if over_budget():
            raise TimeoutError
        from dolfinx_materials_tpu.models import FeFpJ2Plasticity
        from dolfinx_materials_tpu.ops import tensors as _tn

        fefp = FeFpJ2Plasticity(el, hard)
        nf = 1 << 17
        rng2 = np.random.default_rng(1)
        F0 = np.tile(np.eye(3), (nf, 1, 1)) + 2e-2 * rng2.standard_normal((nf, 3, 3))
        Fv0 = jnp.asarray(
            np.asarray(_tn.mat_to_nonsym(jnp.asarray(F0))), jnp.float32
        )
        st0 = {
            "be": jnp.tile(jnp.asarray(_tn.I2, jnp.float32), (nf, 1)),
            "p": jnp.zeros(nf, jnp.float32),
            "F_prev": jnp.tile(jnp.asarray(_tn.I9, jnp.float32), (nf, 1)),
        }
        extras["fefp_gp_per_s"] = float(
            chained_gp(
                fefp.batched_update, Fv0, st0,
                # Ct must feed the carry or XLA dead-code-eliminates the
                # 9-seed tangent pass (same trick as the J2 loop's X term)
                lambda x0, out: x0 + 1e-6 * out[0] + 1e-9 * out[1][:, :9], nf,
            )
        )
        if chained_gp_lower_bound["flag"]:
            extras["fefp_gp_per_s_lower_bound"] = True
    except Exception as e:  # pragma: no cover - diagnostics only
        extras["fefp_gp_per_s"] = f"failed: {type(e).__name__}"

    try:
        if over_budget():
            raise TimeoutError
        # unstructured banded-engine matvec (VERDICT r2 item 2): Delaunay tri
        # mesh, banded lane-gather matvec vs the scalar gather-map path
        from scipy.spatial import Delaunay as _Del

        from dolfinx_materials_tpu.fem import reorder_mesh as _rm
        from dolfinx_materials_tpu.fem.assembly import QuadratureDomain as _QD
        from dolfinx_materials_tpu.fem.mesh import Mesh as _Mesh
        from dolfinx_materials_tpu.fem.space import FunctionSpace as _FSb

        _g = 182  # ~33k vertices -> ~66k dofs
        _xx, _yy = np.meshgrid(np.arange(_g), np.arange(_g))
        _rngb = np.random.default_rng(7)
        _pts = np.stack([_xx, _yy], -1).reshape(-1, 2) / _g + _rngb.uniform(
            -0.25 / _g, 0.25 / _g, (_g * _g, 2)
        )
        _bmesh = _rm(_Mesh(_pts, _Del(_pts).simplices.astype(np.int32), "triangle"))
        _Vb = _FSb(_bmesh, 1, (2,))
        _domb = _QD(_Vb, 2)
        assert _domb.banded_active, "banded plans must build for this metric"
        _Keb = jnp.asarray(
            _rngb.random((_domb.ne, _domb.ndof_el, _domb.ndof_el)).astype(
                np.float32
            )
        )
        _Kpb = _domb.spmv_prepare(_Keb)
        _vb = jnp.asarray(_rngb.random(_Vb.num_dofs).astype(np.float32))

        @jax.jit
        def _mv_loop(v, k):
            return jax.lax.fori_loop(
                0, k,
                lambda i, v: v * 0.999999 + 1e-12 * jnp.sum(_domb.spmv(_Kpb, v)),
                v,
            )

        # DIFFERENTIAL timing (K=24 vs K=4): a single-dispatch loop carries
        # ~1.8 ms of tunnel dispatch latency, which at r2/r3-kernel speeds
        # DOMINATES the per-matvec quotient (r2 recorded 2.24 ms of which
        # ~1.75 ms was dispatch). The differential cancels it and reports the
        # steady-state matvec — NOT comparable to the r2 number.
        def _t_mv(k):
            float(jnp.sum(_mv_loop(_vb, k)))
            best = np.inf
            for _ in range(3):
                _t0 = time.perf_counter()
                float(jnp.sum(_mv_loop(_vb, k)))
                best = min(best, time.perf_counter() - _t0)
            return best

        extras["banded_matvec_66kdof_ms"] = float(
            (_t_mv(24) - _t_mv(4)) / 20 * 1e3
        )
    except Exception as e:  # pragma: no cover
        extras["banded_matvec_66kdof_ms"] = f"failed: {type(e).__name__}"

    try:
        if over_budget():
            raise TimeoutError
        from dolfinx_materials_tpu.models import Ogden

        og = Ogden(mu=(0.4e6,), alpha=(28.8,), K=1e9)
        no = 1 << 16
        F0 = np.tile(np.eye(3), (no, 1, 1)) + 0.1 * np.random.default_rng(
            3
        ).standard_normal((no, 3, 3))
        from dolfinx_materials_tpu.ops import tensors as _tn2

        Fvo = jnp.asarray(
            np.asarray(_tn2.mat_to_nonsym(jnp.asarray(F0))), jnp.float32
        )
        extras["ogden_gp_per_s"] = float(
            chained_gp(
                og.batched_update, Fvo, {},
                lambda x0, out: x0 + 1e-9 * out[0] + 1e-12 * out[1][:, :9],
                no, K1=1, K2=4,
            )
        )
        if chained_gp_lower_bound["flag"]:
            extras["ogden_gp_per_s_lower_bound"] = True
    except Exception as e:  # pragma: no cover
        extras["ogden_gp_per_s"] = f"failed: {type(e).__name__}"

    print(
        json.dumps(
            {
                "metric": "j2_return_map_gauss_point_updates_per_s",
                "value": float(full),
                "unit": "GP/s",
                "vs_baseline": float(full / BASELINE_GP_PER_S),
                "factored_gp_per_s": float(fact),
                # best-of-N + per-rep spread (VERDICT r4 directive 3: record
                # tunnel variance so doc claims can be checked within it)
                "full_gp_stats": full_stats,
                "factored_gp_stats": fact_stats,
                "parity_sig": err_sig,
                "parity_Ct": err_Ct,
                "parity_p": err_p,
                "parity_Ct_factored": err_fact,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
