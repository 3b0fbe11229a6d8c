"""Config sweep for the tet-P2 mixed protocol (VERDICT r4 directive 2).

Runs several (rtol, cg_rtol, n_cg, n_newton) configs of the N=8 coarse
protocol on the real TPU, printing warm time + per-step rel |R| for each.
Temporary experiment driver — delete before end of round.
"""
import sys
import time

sys.path.insert(0, ".")

from dolfinx_materials_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import importlib.util as ilu

spec = ilu.spec_from_file_location("ogden_demo", "demos/ogden_block_tpu.py")
mod = ilu.module_from_spec(spec)
spec.loader.exec_module(mod)

import numpy as np

CONFIGS = [
    # (label, n_newton, n_cg, rtol, cg_rtol)
    ("B rtol1e-4", 20, 100, 1e-4, 1e-3),
    ("C cgr1e-2", 20, 100, 1e-6, 1e-2),
    ("D ncg50", 20, 50, 1e-6, 1e-3),
    ("E rtol1e-4+cgr1e-2", 20, 100, 1e-4, 1e-2),
]

for label, nn, ncg, rt, cgr in CONFIGS:
    t0 = time.perf_counter()
    try:
        u, t_warm, rns, rn0s = mod.run_10_steps(
            8, nn, ncg, n_devices=1, cell_type="tetrahedron", degree=2,
            precision="mixed", rtol=rt, cg_rtol=cgr,
        )
        rel = np.asarray(rns) / np.maximum(np.asarray(rn0s), 1e-300)
        print(
            f"==> {label}: warm {t_warm:.2f}s  max rel|R| {rel.max():.1e}  "
            f"(total incl compile {time.perf_counter() - t0:.0f}s)",
            flush=True,
        )
    except Exception as e:
        print(f"==> {label}: FAILED {type(e).__name__}: {e}", flush=True)
