"""Headline benchmark: J2 return-mapping Gauss-point constitutive updates/sec.

The BASELINE.json north-star metric: >= 1e8 J2 (von Mises + Voce) return-mapping
updates/sec per chip, each update producing stress, new state AND the 6x6
consistent tangent (the per-Newton-iteration workload, reference hot path
dolfinx_materials/jaxmat.py:147-155). ``vs_baseline`` = value / 1e8; from
round 5 on ``value`` is the MEDIAN-of-N differential estimate (VERDICT r4
directive 9 — the best-of-N headline swung 2x between rounds on tunnel noise);
``best_gp_per_s`` keeps the old best-of-N figure for cross-round continuity.

Structure (VERDICT r4 directive 1 — round 4 lost 8 of 12 metrics to a single
shared 840 s budget that the headline's degraded-tunnel compile consumed):

- every phase runs in its OWN SUBPROCESS with its OWN timeout slice
  (``python bench.py --phase NAME --budget S``);
- the three END-TO-END reference-benchmark rows (composite Ogden+SVK,
  tet-P2 block, hex-P1 block — reference timing_results.csv:1-6) run FIRST,
  before the spread-heavy kernel timing;
- phases print one JSON line per metric AS they measure it; the orchestrator
  merges every parseable line from a phase's stdout EVEN IF the phase timed
  out or crashed afterwards (``subprocess.TimeoutExpired.stdout``), so a
  partially-complete phase still lands its finished rows;
- after each phase the running result dict is checkpointed to
  ``BENCH_partial.json`` (a black box if the driver kills the whole run);
  stdout itself carries exactly ONE final JSON line;
- all jax work inherits the persistent ``.jax_cache`` compile cache, so a
  bench run after the last code change makes the driver's end-of-round run
  warm (utils/cache.py).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}.
"""

import json
import os
import sys
import time

BASELINE_GP_PER_S = 1e8
HERE = os.path.dirname(os.path.abspath(__file__))

# ---------------------------------------------------------------------------
# phase table: (name, base timeout seconds). End-to-end rows first.
# ---------------------------------------------------------------------------
PHASES = [
    # probe slice: the axon tunnel's backend init has been observed to take
    # ~5.5 min while still being perfectly usable afterwards (round-5 log);
    # a probe timeout must mean DEAD, not merely slow-to-wake
    ("probe", 400.0),
    ("composite", 720.0),
    ("tet_p2", 720.0),
    ("hex_p1", 420.0),
    ("headline", 540.0),
    ("fused_step", 300.0),
    ("kernels", 480.0),
]
TOTAL_BUDGET_S = float(os.environ.get("BENCH_TOTAL_BUDGET_S", 1500.0))
MIN_SLICE_S = 120.0
#: manual long-window captures can stretch every phase slice (the driver's
#: run keeps the default 1x); cold fused-3D compiles under a slow tunnel
#: need ~15-20 min, which no 1500s-budget slicing can grant
_scale = float(os.environ.get("BENCH_PHASE_SCALE", 1.0))
if _scale != 1.0:
    PHASES = [(n, t * _scale) for n, t in PHASES]

#: the primary key each phase owns — set to "failed: ..." when the phase
#: produced nothing, so consumers always see the row
PRIMARY_KEY = {
    "probe": "tunnel",
    "composite": "ogden3d_composite_solve_10steps_s",
    "tet_p2": "ogden3d_tet_p2_solve_10steps_s",
    "hex_p1": "ogden3d_solve_10steps_s",
    "headline": "value",
    "fused_step": "fused_step_64x64_ms",
    "kernels": "crystal_gp_per_s",
}

#: demo-emitted key -> bench key (phases that reuse the demos' --bench
#: entries keep the demos' own key names on their stdout)
KEYMAP = {
    "composite_10steps_s": "ogden3d_composite_solve_10steps_s",
    "composite_rel_R": "ogden3d_composite_rel_R",
    "composite_dofs": "ogden3d_composite_dofs",
    "tet_p2_10steps_s": "ogden3d_tet_p2_solve_10steps_s",
    "tet_p2_rel_R": "ogden3d_tet_p2_rel_R",
    "hex_p1_10steps_s": "ogden3d_solve_10steps_s",
    "hex_p1_final_residual": "ogden3d_final_residual",
}
DROP_KEYS = {"E_pen"}


def emit(d):
    """One JSON metric line, flushed immediately — the orchestrator must see
    it even if this phase is killed one microsecond later."""
    sys.stdout.write(json.dumps(d) + "\n")
    sys.stdout.flush()


# ---------------------------------------------------------------------------
# phases (each runs in its own subprocess)
# ---------------------------------------------------------------------------


def phase_probe(budget):
    """Tunnel-health probe: backend init + one tiny matmul with a forced
    scalar readback. The axon tunnel has two distinct failure modes observed
    on this box — backend init hangs (make_c_api_client never returns) and
    ZOMBIE mode (devices() lists the chip but every dispatch stalls). A
    10-second probe phase makes a dead-tunnel BENCH self-explaining: every
    later timeout row is then attributable to the recorded tunnel state, not
    to the framework."""
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    t_init = time.perf_counter()
    dev = jax.devices()[0]
    x = jnp.ones((512, 512), jnp.float32)
    v = float((x @ x).sum())
    assert v == 512.0 ** 3, v
    emit({
        "tunnel": "ok",
        "tunnel_device": str(dev),
        "tunnel_init_s": round(t_init - t0, 2),
        "tunnel_probe_s": round(time.perf_counter() - t0, 2),
    })


def phase_headline(budget):
    """On-device parity gate + the J2 full/factored GP/s differential timing.

    Identical kernel construction and loop shape to rounds 2-4 (the persistent
    compile cache keys on the traced HLO — keep it byte-stable). Adaptive
    reps: if the warm-up compile ate most of the slice, drop from 4 reps to 2
    instead of timing out with nothing (VERDICT r4 directive 1c).
    """
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dolfinx_materials_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from dolfinx_materials_tpu.models import LinearElasticIsotropic, VoceHardening
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
    emit({
        "parity_sig": err_sig,
        "parity_Ct": err_Ct,
        "parity_p": err_p,
        "parity_Ct_factored": err_fact,
    })

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

    def timed_reps(loop, K, reps):
        out = loop(eps_T, epsp_T, p_row, K)
        float(jnp.sum(out[0]))  # forced scalar readback = real sync
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(eps_T, epsp_T, p_row, K)
            float(jnp.sum(out[0]))
            ts.append(time.perf_counter() - t0)
        return ts

    def gp_per_s(upd, reps, K1=2, K2=22):
        """Differential estimates over ``reps`` deep-loop repetitions; returns
        (median, best, stats). Each deep rep is paired with the best
        short-loop time; spread = (max-min)/best over the per-rep GP/s."""
        loop = make_loop(upd)
        t1 = min(timed_reps(loop, K1, reps))
        t2s = timed_reps(loop, K2, reps)
        ests = sorted(n * (K2 - K1) / (t2 - t1) for t2 in t2s if t2 > t1)
        if not ests:  # tunnel noise fallback: single-loop conservative bound
            v = n * K2 / min(t2s)
            return v, v, {"best_of": reps, "spread_rel": None, "lower_bound": True}
        best = ests[-1]
        med = ests[len(ests) // 2] if len(ests) % 2 else 0.5 * (
            ests[len(ests) // 2 - 1] + ests[len(ests) // 2]
        )
        return med, best, {
            "best_of": reps,
            "spread_rel": round((ests[-1] - ests[0]) / best, 4),
        }

    # adaptive reps: a degraded-tunnel compile must shrink the timing, not
    # starve it (each deep rep at steady state is ~30 ms; compiles dominate)
    reps = 4 if (budget - (time.perf_counter() - t0)) > 180.0 else 2
    med, best, full_stats = gp_per_s(update, reps)
    emit({
        "metric": "j2_return_map_gauss_point_updates_per_s",
        "value": float(med),
        "unit": "GP/s",
        "vs_baseline": float(med / BASELINE_GP_PER_S),
        "best_gp_per_s": float(best),
        "full_gp_stats": full_stats,
    })
    med_f, best_f, fact_stats = gp_per_s(upd_fact, reps)
    emit({
        "factored_gp_per_s": float(med_f),
        "factored_best_gp_per_s": float(best_f),
        "factored_gp_stats": fact_stats,
    })


def phase_fused_step(budget):
    """Fused FEM load step (6 Newton x 30 two-level-CG, 64x64 J2 plate) — the
    one-XLA-program global-solve datapoint (docs/perf.md). The DOCUMENTED
    configuration is the one recorded (VERDICT r2 item 5), with the achieved
    residual printed alongside the wall time."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dolfinx_materials_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from dolfinx_materials_tpu import (
        Material,
        NonlinearMaterialProblem,
        QuadratureMap,
    )
    from dolfinx_materials_tpu.fem import (
        DirichletBC,
        Function,
        FunctionSpace,
        create_unit_square,
        locate_dofs_geometrical,
    )
    from dolfinx_materials_tpu.fem.bc import combine_bcs
    from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
    from dolfinx_materials_tpu.models import (
        LinearElasticIsotropic,
        VoceHardening,
        vonMisesIsotropicHardening,
    )
    from dolfinx_materials_tpu.parallel import device_mesh, make_sharded_newton_step

    el = LinearElasticIsotropic(70e3, 0.3)
    hard = VoceHardening(350.0, 500.0, 1e3)
    mat = Material(vonMisesIsotropicHardening(el, hard))
    mesh = create_unit_square(64, 64, "quad")
    V = FunctionSpace(mesh, 1, (2,))
    qmap = QuadratureMap(V, 2, mat)
    qmap.register_gradient("Strain", mandel_strain_2d())
    left = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 0), 0)
    bot = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 1], 0), 1)
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[:, 0], 1), 0)
    bcs = [DirichletBC(left, 0.0), DirichletBC(bot, 0.0),
           DirichletBC(right, 2 * 350.0 / 70e3)]
    prob = NonlinearMaterialProblem(qmap, Function(V), bcs=bcs)
    step, pad = make_sharded_newton_step(
        qmap, prob, device_mesh(1), n_newton=6, n_cg=30, pc="two_level"
    )
    mask, vals = combine_bcs(bcs, V.num_dofs)
    st0 = pad(mat.data_manager.s0.internal)
    u0 = jnp.zeros(V.num_dofs, jnp.float32)
    u, _, rn = step(u0, st0, mask, vals, 0.0)
    float(jnp.sum(u))
    best = np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        u, _, rn = step(u0, st0, mask, vals, 0.0)
        float(jnp.sum(u))
        best = min(best, time.perf_counter() - t0)
    emit({
        "fused_step_64x64_ms": float(best * 1e3),
        "fused_step_residual": float(rn),
        "fused_step_config": "6newton_x_30cg_two_level",
    })


def phase_kernels(budget):
    """Secondary model-family kernel rows: crystal, FeFp, banded matvec,
    Ogden. Each in its own try/except, each emitted as soon as measured."""
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dolfinx_materials_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    # chained_gp protocol flags (ADVICE r3): when the differential signal is
    # noise-swamped even after deepening the chain, the returned figure is a
    # dispatch-INCLUSIVE lower bound computed by a different protocol; the
    # "<metric>_lower_bound": True flag tells BENCH consumers the estimates
    # apart instead of silently comparing apples to oranges.
    lower_bound = {"flag": False}

    def chained_gp(upd, x0, state0, evolve, n_pts, K1=2, K2=8):
        lower_bound["flag"] = False

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
            lower_bound["flag"] = True
            return n_pts * K2 / t2
        return n_pts * (K2 - K1) / dt

    try:
        from dolfinx_materials_tpu.material import Material
        from dolfinx_materials_tpu.models import MericCailletaudCrystalPlasticity

        beh_c = MericCailletaudCrystalPlasticity()
        mat_c = Material(beh_c)
        nc = 1 << 14
        mat_c.set_data_manager(nc)
        eps0 = jnp.asarray(
            (2e-3 * np.random.default_rng(2).standard_normal((nc, 6))).astype(
                np.float32
            )
        )
        stc = mat_c.data_manager.s0.internal
        row = {"crystal_gp_per_s": float(chained_gp(
            beh_c.batched_update, eps0, stc,
            lambda x0, out: x0 + 1e-9 * out[0] + 1e-12 * out[1][:, :6],
            # K2=8: the early-exiting crystal Newton's per-step time needs
            # more chained steps to stay above tunnel noise
            nc, K1=1, K2=8,
        ))}
        if lower_bound["flag"]:
            row["crystal_gp_per_s_lower_bound"] = True
        emit(row)
    except Exception as e:  # pragma: no cover
        emit({"crystal_gp_per_s": f"failed: {type(e).__name__}"})

    try:
        from dolfinx_materials_tpu.models import (
            FeFpJ2Plasticity,
            LinearElasticIsotropic,
            VoceHardening,
        )
        from dolfinx_materials_tpu.ops import tensors as tn

        el = LinearElasticIsotropic(70e3, 0.3)
        hard = VoceHardening(350.0, 500.0, 1e3)
        fefp = FeFpJ2Plasticity(el, hard)
        nf = 1 << 17
        rng2 = np.random.default_rng(1)
        F0 = np.tile(np.eye(3), (nf, 1, 1)) + 2e-2 * rng2.standard_normal(
            (nf, 3, 3)
        )
        Fv0 = jnp.asarray(np.asarray(tn.mat_to_nonsym(jnp.asarray(F0))), jnp.float32)
        st0 = {
            "be": jnp.tile(jnp.asarray(tn.I2, jnp.float32), (nf, 1)),
            "p": jnp.zeros(nf, jnp.float32),
            "F_prev": jnp.tile(jnp.asarray(tn.I9, jnp.float32), (nf, 1)),
        }
        row = {"fefp_gp_per_s": float(chained_gp(
            fefp.batched_update, Fv0, st0,
            # Ct must feed the carry or XLA dead-code-eliminates the
            # 9-seed tangent pass (same trick as the J2 loop's X term)
            lambda x0, out: x0 + 1e-6 * out[0] + 1e-9 * out[1][:, :9], nf,
        ))}
        if lower_bound["flag"]:
            row["fefp_gp_per_s_lower_bound"] = True
        emit(row)
    except Exception as e:  # pragma: no cover
        emit({"fefp_gp_per_s": f"failed: {type(e).__name__}"})

    try:
        # unstructured banded-engine matvec (VERDICT r2 item 2): Delaunay tri
        # mesh, banded lane-gather matvec vs the scalar gather-map path
        from scipy.spatial import Delaunay

        from dolfinx_materials_tpu.fem import reorder_mesh
        from dolfinx_materials_tpu.fem.assembly import QuadratureDomain
        from dolfinx_materials_tpu.fem.mesh import Mesh
        from dolfinx_materials_tpu.fem.space import FunctionSpace

        g = 182  # ~33k vertices -> ~66k dofs
        xx, yy = np.meshgrid(np.arange(g), np.arange(g))
        rngb = np.random.default_rng(7)
        pts = np.stack([xx, yy], -1).reshape(-1, 2) / g + rngb.uniform(
            -0.25 / g, 0.25 / g, (g * g, 2)
        )
        bmesh = reorder_mesh(Mesh(pts, Delaunay(pts).simplices.astype(np.int32),
                                  "triangle"))
        Vb = FunctionSpace(bmesh, 1, (2,))
        domb = QuadratureDomain(Vb, 2)
        assert domb.banded_active, "banded plans must build for this metric"
        Keb = jnp.asarray(
            rngb.random((domb.ne, domb.ndof_el, domb.ndof_el)).astype(np.float32)
        )
        Kpb = domb.spmv_prepare(Keb)
        vb = jnp.asarray(rngb.random(Vb.num_dofs).astype(np.float32))

        @jax.jit
        def mv_loop(v, k):
            return jax.lax.fori_loop(
                0, k,
                lambda i, v: v * 0.999999 + 1e-12 * jnp.sum(domb.spmv(Kpb, v)),
                v,
            )

        # DIFFERENTIAL timing (K=24 vs K=4): a single-dispatch loop carries
        # ~1.8 ms of tunnel dispatch latency, which at r2/r3-kernel speeds
        # DOMINATES the per-matvec quotient. The differential cancels it and
        # reports the steady-state matvec — NOT comparable to the r2 number.
        def t_mv(k):
            float(jnp.sum(mv_loop(vb, k)))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(mv_loop(vb, k)))
                best = min(best, time.perf_counter() - t0)
            return best

        emit({"banded_matvec_66kdof_ms": float((t_mv(24) - t_mv(4)) / 20 * 1e3)})
    except Exception as e:  # pragma: no cover
        emit({"banded_matvec_66kdof_ms": f"failed: {type(e).__name__}"})

    try:
        from dolfinx_materials_tpu.models import Ogden
        from dolfinx_materials_tpu.ops import tensors as tn2

        og = Ogden(mu=(0.4e6,), alpha=(28.8,), K=1e9)
        no = 1 << 16
        F0 = np.tile(np.eye(3), (no, 1, 1)) + 0.1 * np.random.default_rng(
            3
        ).standard_normal((no, 3, 3))
        Fvo = jnp.asarray(np.asarray(tn2.mat_to_nonsym(jnp.asarray(F0))), jnp.float32)
        row = {"ogden_gp_per_s": float(chained_gp(
            og.batched_update, Fvo, {},
            lambda x0, out: x0 + 1e-9 * out[0] + 1e-12 * out[1][:, :9],
            no, K1=1, K2=4,
        ))}
        if lower_bound["flag"]:
            row["ogden_gp_per_s_lower_bound"] = True
        emit(row)
    except Exception as e:  # pragma: no cover
        emit({"ogden_gp_per_s": f"failed: {type(e).__name__}"})


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------


def run_phase(name, timeout_s, cmd=None):
    """Run one phase subprocess; return the dict of every JSON line it
    printed (partial results survive a timeout via TimeoutExpired.stdout).
    ``cmd`` overrides the phase command (tests exercise the merge/timeout
    contract with scripted subprocesses)."""
    import subprocess

    if cmd is not None:
        pass
    elif name == "composite":
        cmd = [sys.executable, os.path.join(HERE, "demos",
                                            "composite_hyperelasticity_tpu.py"),
               "--bench"]
    elif name == "tet_p2":
        cmd = [sys.executable, os.path.join(HERE, "demos", "ogden_block_tpu.py"),
               "--bench"]
    elif name == "hex_p1":
        cmd = [sys.executable, os.path.join(HERE, "demos", "ogden_block_tpu.py"),
               "--bench", "hex"]
    else:
        cmd = [sys.executable, os.path.abspath(__file__), "--phase", name,
               "--budget", str(timeout_s)]
    out_text, status = "", "ok"
    try:
        out = subprocess.run(cmd, cwd=HERE, capture_output=True, text=True,
                             timeout=timeout_s)
        out_text = out.stdout or ""
        if out.returncode != 0:
            status = f"rc={out.returncode}: {(out.stderr or '').strip()[-300:]}"
    except subprocess.TimeoutExpired as e:
        def _dec(b):
            return b.decode(errors="replace") if isinstance(b, bytes) else (b or "")
        out_text = _dec(e.stdout)
        status = f"timeout after {timeout_s:.0f}s"
    except Exception as e:  # pragma: no cover
        status = f"{type(e).__name__}: {e}"
    merged = {}
    for line in out_text.splitlines():
        line = line.strip()
        if not (line.startswith("{") and line.endswith("}")):
            continue
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if isinstance(d, dict):
            merged.update(d)
    return merged, status


def main():
    import subprocess

    # The axon TPU tunnel can hang INDEFINITELY at backend init (observed
    # 2026-08-17: jax.devices() blocked for 8+ hours). Probe it in a
    # disposable subprocess first so a dead tunnel produces a bounded,
    # parseable failure line instead of a silent driver timeout that loses
    # every metric. The tunnel has also been observed to RECOVER within
    # minutes (round-5 builder log), so a failed probe gets one more chance
    # after a pause before the run is declared unreachable.
    probe_err, probe_tries = None, 2
    for attempt in range(probe_tries):
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=240, check=True, capture_output=True,
            )
            probe_err = None
            break
        except Exception as e:
            probe_err = e
            if attempt + 1 < probe_tries:
                time.sleep(90.0)
    if probe_err is not None:
        print(json.dumps({
            "metric": "j2_return_map_gauss_point_updates_per_s",
            "value": 0.0,
            "unit": "GP/s",
            "vs_baseline": 0.0,
            "error": "tpu_backend_unreachable_at_bench_time "
            f"({type(probe_err).__name__}, {probe_tries} probes 90s apart)",
        }))
        return

    t_start = time.perf_counter()
    results = {}
    phase_log = {}

    def absorb(name, merged, status, retry=False):
        for k, v in merged.items():
            if k in DROP_KEYS:
                continue
            results[KEYMAP.get(k, k)] = v
        if status != "ok" or retry:
            phase_log[name] = (f"{phase_log[name]}; retry: {status}"
                               if retry and name in phase_log else status)
        if PRIMARY_KEY[name] not in results:
            results[PRIMARY_KEY[name]] = f"failed: {status}"
        # round the rel-residual lists for readability
        for k in ("ogden3d_composite_rel_R", "ogden3d_tet_p2_rel_R"):
            if k in results and isinstance(results[k], list):
                results[k] = [float(f"{r:.3e}") for r in results[k]]
        # black box: checkpoint after every phase in case the driver kills us
        snap = dict(results)
        if phase_log:
            snap["phase_log"] = phase_log
        try:
            with open(os.path.join(HERE, "BENCH_partial.json"), "w") as f:
                json.dump(snap, f, indent=1)
        except OSError:
            pass

    for i, (name, base) in enumerate(PHASES):
        remaining = TOTAL_BUDGET_S - (time.perf_counter() - t_start)
        # reserve a minimum slice for every phase still queued behind this one
        reserve = MIN_SLICE_S * (len(PHASES) - i - 1)
        slice_s = min(base, max(MIN_SLICE_S, remaining - reserve))
        if remaining < 60.0:
            phase_log[name] = "skipped: global budget exhausted"
            if PRIMARY_KEY[name] not in results:
                results.setdefault(PRIMARY_KEY[name], "failed: global_budget")
            continue
        merged, status = run_phase(name, slice_s)
        absorb(name, merged, status)

    # second chance: when budget remains (phases crashed fast, or the tunnel
    # recovered mid-run), retry failed phases once, in priority order
    for name, base in PHASES:
        if name == "probe":
            continue
        if not str(results.get(PRIMARY_KEY[name], "")).startswith("failed"):
            continue
        remaining = TOTAL_BUDGET_S - (time.perf_counter() - t_start)
        if remaining < MIN_SLICE_S + 30.0:
            break
        merged, status = run_phase(name, min(base, remaining - 30.0))
        if PRIMARY_KEY[name] in results and \
                str(results[PRIMARY_KEY[name]]).startswith("failed"):
            del results[PRIMARY_KEY[name]]  # let a successful retry replace it
        absorb(name, merged, status, retry=True)

    # reference comparison constants for the end-to-end rows
    # (reference demos/mfront/hyperelasticity/timing_results.csv)
    if not isinstance(results.get("ogden3d_composite_solve_10steps_s"), str) or \
       not isinstance(results.get("ogden3d_tet_p2_solve_10steps_s"), str):
        results["ogden3d_ref_1rank_s"] = 18.5
        results["ogden3d_ref_8rank_s"] = 5.46

    # headline fallback: the driver's parser must always find the triplet
    out = {
        "metric": "j2_return_map_gauss_point_updates_per_s",
        "value": results.pop("value", 0.0),
        "unit": results.pop("unit", "GP/s"),
        "vs_baseline": results.pop("vs_baseline", 0.0),
    }
    results.pop("metric", None)
    out.update(results)
    if phase_log:
        out["phase_log"] = phase_log
    print(json.dumps(out))


if __name__ == "__main__":
    if "--phase" in sys.argv:
        name = sys.argv[sys.argv.index("--phase") + 1]
        budget = float(sys.argv[sys.argv.index("--budget") + 1]) \
            if "--budget" in sys.argv else 600.0
        {"probe": phase_probe,
         "headline": phase_headline,
         "fused_step": phase_fused_step,
         "kernels": phase_kernels}[name](budget)
    else:
        main()
