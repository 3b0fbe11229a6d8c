"""Roofline/cost-breakdown measurements for crystal / FeFp / Ogden
(VERDICT r4 directive 4). Deep-chained differential timing on the real TPU;
prints one line per measurement. Temporary experiment driver.
"""
import sys
import time

sys.path.insert(0, ".")

from dolfinx_materials_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu.models import (
    FeFpJ2Plasticity,
    LinearElasticIsotropic,
    MericCailletaudCrystalPlasticity,
    Ogden,
    VoceHardening,
)
from dolfinx_materials_tpu.ops import tensors as tn


def chained(fn, x0, st0, evolve, n_pts, K1=2, K2=10, reps=3):
    """Differential chained GP/s + spread: same protocol as bench.py but
    deeper by default."""

    @jax.jit
    def loop(x, st, K):
        def body(i, carry):
            xc, stc = carry
            out = fn(xc, stc, 1e-2)
            return evolve(x0, out), out[-1]

        return jax.lax.fori_loop(0, K, body, (x, st))

    def t(K):
        out = loop(x0, st0, K)
        float(jnp.sum(out[0]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(x0, st0, K)
            float(jnp.sum(out[0]))
            ts.append(time.perf_counter() - t0)
        return ts

    t1 = min(t(K1))
    t2s = t(K2)
    ests = [n_pts * (K2 - K1) / (x - t1) for x in t2s if x > t1]
    if not ests:
        return float("nan"), 0.0
    best = max(ests)
    return best, (max(ests) - min(ests)) / best


STREAM_GBS = 619.0  # measured XLA stream scale (docs/perf.md)

el = LinearElasticIsotropic(70e3, 0.3)
hard = VoceHardening(350.0, 500.0, 1e3)
rng = np.random.default_rng(0)

# ---------------- crystal ----------------------------------------------------
from dolfinx_materials_tpu.material import Material as _Mat

beh_c = MericCailletaudCrystalPlasticity()
nc = 1 << 16
eps0 = jnp.asarray((2e-3 * rng.standard_normal((nc, 6))).astype(np.float32))
_mat_c = _Mat(beh_c)
_mat_c.set_data_manager(nc)
st_c = _mat_c.data_manager.s0.internal
ev_c = lambda x0, out: x0 + 1e-9 * out[0] + 1e-12 * out[1][:, :6]
v, s = chained(beh_c.batched_update, eps0, st_c, ev_c, nc, K1=2, K2=10)
# crystal I/O: in 6 + state (6+12+12+12)=42; out 6 + 36 + 42  -> 132 f32
byt = 132 * 4
print(f"crystal full: {v:.3e} GP/s (spread {s:.2f}) | {v*byt/1e9:.1f} GB/s "
      f"= {100*v*byt/1e9/STREAM_GBS:.2f}% of STREAM", flush=True)

ev_cf = lambda x0, out: x0 + 1e-9 * out[0]
v_f, s_f = chained(
    lambda x, st, dt: beh_c.batched_flux(x, st, dt), eps0, st_c, ev_cf, nc,
    K1=2, K2=10,
)
print(f"crystal flux: {v_f:.3e} GP/s (spread {s_f:.2f}) -> tangent share "
      f"{1 - v_f and (1/v - 1/v_f)/(1/v):.2f}", flush=True)

# iteration-count scaling: budget 48 -> 12 (early exit should make this flat
# on this mild load; if time scales, the while_loop burns the budget)
beh_c12 = MericCailletaudCrystalPlasticity(fm_newton_iters=12)
v12, s12 = chained(beh_c12.batched_update, eps0, st_c, ev_c, nc, K1=2, K2=10)
print(f"crystal full @12-iter budget: {v12:.3e} GP/s (spread {s12:.2f})",
      flush=True)

# ---------------- FeFp --------------------------------------------------------
for iters in (16, 6, 4):
    fefp = FeFpJ2Plasticity(el, hard, fm_newton_iters=iters)
    nf = 1 << 17
    F0 = np.tile(np.eye(3), (nf, 1, 1)) + 2e-2 * rng.standard_normal((nf, 3, 3))
    Fv0 = jnp.asarray(np.asarray(tn.mat_to_nonsym(jnp.asarray(F0))), jnp.float32)
    st0 = {
        "be": jnp.tile(jnp.asarray(tn.I2, jnp.float32), (nf, 1)),
        "p": jnp.zeros(nf, jnp.float32),
        "F_prev": jnp.tile(jnp.asarray(tn.I9, jnp.float32), (nf, 1)),
    }
    ev_f = lambda x0, out: x0 + 1e-6 * out[0] + 1e-9 * out[1][:, :9]
    v, s = chained(fefp.batched_update, Fv0, st0, ev_f, nf, K1=2, K2=10)
    # parity vs the 16-iter reference on the same batch
    if iters == 16:
        ref_out = fefp.batched_update(Fv0, st0, 1e-2)
        ref_sig = np.asarray(ref_out[0])
        scale = np.abs(ref_sig).max()
        v16 = v
        err = 0.0
    else:
        out = fefp.batched_update(Fv0, st0, 1e-2)
        err = float(np.abs(np.asarray(out[0]) - ref_sig).max() / scale)
    byt = (9 + 6 + 1 + 9 + 9 + 81 + 16) * 4
    print(f"fefp full @{iters} iters: {v:.3e} GP/s (spread {s:.2f}) "
          f"| {v*byt/1e9:.1f} GB/s = {100*v*byt/1e9/STREAM_GBS:.2f}% STREAM "
          f"| parity vs 16-iter {err:.1e}", flush=True)

fefp = FeFpJ2Plasticity(el, hard)
ev_ff = lambda x0, out: x0 + 1e-6 * out[0]
v_ff, s_ff = chained(
    lambda x, st, dt: fefp.batched_flux(x, st, dt), Fv0, st0, ev_ff, nf,
    K1=2, K2=10,
)
print(f"fefp flux: {v_ff:.3e} GP/s (spread {s_ff:.2f})", flush=True)

# ---------------- Ogden -------------------------------------------------------
og = Ogden(mu=(0.4e6,), alpha=(28.8,), K=1e9)
no = 1 << 16
F0 = np.tile(np.eye(3), (no, 1, 1)) + 0.1 * rng.standard_normal((no, 3, 3))
Fvo = jnp.asarray(np.asarray(tn.mat_to_nonsym(jnp.asarray(F0))), jnp.float32)
ev_o = lambda x0, out: x0 + 1e-9 * out[0] + 1e-12 * out[1][:, :9]
v_o, s_o = chained(og.batched_update, Fvo, {}, ev_o, no, K1=2, K2=10)
byt = (9 + 9 + 81) * 4
print(f"ogden full: {v_o:.3e} GP/s (spread {s_o:.2f}) | {v_o*byt/1e9:.1f} "
      f"GB/s = {100*v_o*byt/1e9/STREAM_GBS:.2f}% STREAM", flush=True)

def og_flux(x, st, dt):
    pk1 = og.batched_flux(x, st, dt)
    if isinstance(pk1, tuple):
        pk1 = pk1[0]
    return pk1, st

ev_of = lambda x0, out: x0 + 1e-9 * out[0]
try:
    v_of, s_of = chained(og_flux, Fvo, {}, ev_of, no, K1=2, K2=10)
    print(f"ogden flux: {v_of:.3e} GP/s (spread {s_of:.2f}) -> tangent is "
          f"{v_of / v_o:.1f}x the flux cost", flush=True)
except Exception as e:
    print("ogden flux failed:", type(e).__name__, str(e)[:100], flush=True)

# ---------------- pure-I/O ceilings per family mix ---------------------------
# The J2 method (docs/perf.md "Saturation analysis"): a kernel with the SAME
# input/output array shapes but trivial arithmetic measures the achievable
# HBM rate for that exact I/O mix — the family's memory-side ceiling. All
# three families sit far below it (compute-bound), which is the point the
# round-5 tables document.

def pure_io_gp(n_in, n_out, n_pts, K1=2, K2=10):
    """Chained kernel reading n_in rows and writing n_out (+n_in carry) rows
    per iteration. The (n_out, n) block is a loop carry, so XLA must
    materialize it to HBM every iteration (no DCE/fusion escape); per-row
    iota scaling keeps rows distinct. Accounted traffic/iter =
    (2*n_in + n_out) rows — slightly MORE than the family's read-n_in/
    write-n_out mix, so the printed ceiling is conservative."""
    x0 = jnp.ones((n_in, n_pts), jnp.float32)
    a0 = jnp.zeros((n_out, n_pts), jnp.float32)
    r = jnp.arange(1, n_out + 1, dtype=jnp.float32)[:, None] * 1e-6

    @jax.jit
    def loop(x, a, K):
        def body(i, c):
            x, a = c
            fi = 1.0 + 1e-9 * i.astype(jnp.float32)  # iteration-dependent
            a_new = r * (jnp.sum(x, 0) * fi)  # reads all n_in, writes n_out
            x_new = x * (1.0 + 1e-20 * a_new[0])
            return (x_new, a_new)

        return jax.lax.fori_loop(0, K, body, (x, a))

    def t(K):
        out = loop(x0, a0, K)
        float(jnp.sum(out[1]))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(x0, a0, K)
            float(jnp.sum(out[1]))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = t(K1), t(K2)
    return n_pts * (K2 - K1) / (t2 - t1)


for name, n_in, n_out, n_pts in (
    ("crystal(48in/84out)", 48, 84, 1 << 16),
    ("fefp(25in/106out)", 25, 106, 1 << 17),
    ("ogden(9in/90out)", 9, 90, 1 << 16),
):
    try:
        v_io = pure_io_gp(n_in, n_out, n_pts)
        gbs = v_io * (2 * n_in + n_out) * 4 / 1e9
        print(f"pure-IO {name}: {v_io:.3e} GP/s ceiling | {gbs:.0f} GB/s",
              flush=True)
    except Exception as e:
        print(f"pure-IO {name} failed:", type(e).__name__, flush=True)
