"""Banded gather: memory-speed unstructured FEM gathers/assembly on TPU.

TPU XLA lowers arbitrary ``v[idx]`` to SCALAR gathers (~0.5M elem/ms measured,
~300x off the HBM roofline — docs/perf.md "Assembly-free SpMV"); structured
grids dodge this with shifted slices, but gmsh meshes and cell subsets cannot.
This module exploits the only fast data-dependent-addressing primitive the VPU
has: the LANE gather (``take_along_axis(x (S,128), c, axis=1)`` -> Mosaic
``tpu.dynamic_gather``), gathering within 128-wide rows.

Algorithm (host-planned, indices are static):
- reorder the mesh so the dofmap is BANDED (fem/reorder.py: reverse
  Cuthill-McKee + cells sorted by min dof);
- chunk the (flattened) output slots; per chunk all indices then live in a
  small WINDOW of consecutive 128-wide rows of the source vector (R rows,
  R ~ bandwidth/128 + chunk extent);
- kernel: stream the window rows in 8-row blocks (scalar-prefetched base per
  chunk), and for each window row r: one lane-gather of the row broadcast
  across sublanes + one select on (rloc == r). Work per output = O(R) VPU ops
  — independent of problem size, no scalar gather anywhere.
- out-of-window outliers (long-range mesh edges) are masked in the kernel and
  patched afterwards by a tiny scalar gather over the recorded positions.

``k_layers`` folds K index sets into one call with SUMMED contributions:
out[n] = sum_k table[idx[n, k]] — this turns SCATTER-ADD assembly into a
gather: for each local element slot i, the map "which cells contribute to dof
d through slot i" is a (ndofs, k_i) gather into CELL space (bandwidth = cell
bandwidth, same R), so residual assembly is one banded_take with K ~= max
cells-per-dof, not a scatter.

The reference gets all of this for free from PETSc/FFCx CSR assembly on CPU
(reference dolfinx_materials/quadrature_map.py:1-14); on TPU the banded window
structure is the equivalent of the CSR row cache.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128
SUB = 8  # window rows streamed per grid step


@dataclass
class BandedTakePlan:
    """Host-side plan for out[n] = sum_k table[idx[n, k]] (static idx)."""

    n_out: int  # real number of outputs
    n_src: int  # real table length
    K: int
    C: int  # outputs per chunk
    S: int  # C // LANE
    ns: int  # number of chunks
    R: int  # window rows per chunk (multiple of SUB)
    nrows: int  # padded table rows
    base8: jnp.ndarray  # (ns,) int32 window base in SUB-row units
    rloc: jnp.ndarray  # (ns, K, S, LANE) int32 window row, -1 = masked
    cloc: jnp.ndarray  # (ns, K, S, LANE) int32 lane column in [0, LANE)
    patch_pos: jnp.ndarray  # (npatch,) output positions of outliers
    patch_idx: jnp.ndarray  # (npatch,) table indices of outliers
    frac_patched: float

    @property
    def vmem_bytes(self):
        return 4 * (SUB * LANE + (2 * self.K + 1) * self.S * LANE)


def plan_banded_take(idx, n_src, chunk=4096, max_R=96) -> BandedTakePlan | None:
    """Plan a banded take. ``idx``: (N,) or (N, K) int array, entries in
    [0, n_src) or -1 (skip). Returns None only if the index set is so
    unbanded that > 20% of entries would need patching (caller should fall
    back to the scalar path)."""
    idx = np.asarray(idx, dtype=np.int64)
    if idx.ndim == 1:
        idx = idx[:, None]
    N, K = idx.shape
    C = int(chunk)
    assert C % LANE == 0
    S = C // LANE
    N_pad = -(-N // C) * C
    ns = N_pad // C
    idx_p = np.full((N_pad, K), -1, np.int64)
    idx_p[:N] = idx
    chunks = idx_p.reshape(ns, C, K)

    valid = chunks >= 0
    big = np.where(valid, chunks, np.int64(1 << 60))
    cmin = big.min(axis=(1, 2))
    cmin = np.where(cmin == (1 << 60), 0, cmin)  # all-invalid chunk
    base8 = (cmin // LANE) // SUB  # SUB-row aligned window base

    rel_row = chunks // LANE - (base8 * SUB)[:, None, None]
    # outliers: rows beyond max_R (or invalid)
    out_of_window = valid & (rel_row >= max_R)
    R_needed = np.where(valid & ~out_of_window, rel_row, 0).max() + 1
    R = int(-(-int(R_needed) // SUB) * SUB)

    keep = valid & ~out_of_window
    rloc = np.where(keep, rel_row, -1).astype(np.int32)
    cloc = np.where(keep, chunks % LANE, 0).astype(np.int32)

    pos_flat = np.nonzero(out_of_window.reshape(N_pad, K))
    patch_pos = pos_flat[0].astype(np.int32)
    patch_idx = idx_p[pos_flat[0], pos_flat[1]].astype(np.int32)
    frac = len(patch_pos) / max(1, N * K)
    if frac > 0.20:
        return None

    nrows = -(-n_src // LANE) + R + SUB  # slack so windows never run off
    nrows = -(-nrows // SUB) * SUB
    return BandedTakePlan(
        n_out=N,
        n_src=n_src,
        K=K,
        C=C,
        S=S,
        ns=ns,
        R=R,
        nrows=nrows,
        base8=jnp.asarray(base8.astype(np.int32)),
        rloc=jnp.asarray(rloc.reshape(ns, C, K).transpose(0, 2, 1).reshape(ns, K, S, LANE)),
        cloc=jnp.asarray(cloc.reshape(ns, C, K).transpose(0, 2, 1).reshape(ns, K, S, LANE)),
        patch_pos=jnp.asarray(patch_pos),
        patch_idx=jnp.asarray(patch_idx),
        frac_patched=frac,
    )


def _apply_patches(plan: BandedTakePlan, out_flat, table):
    if plan.patch_pos.shape[0]:
        out_flat = out_flat.at[plan.patch_pos].add(table[plan.patch_idx])
    return out_flat


def banded_take_xla(table, plan: BandedTakePlan):
    """Reference/CPU implementation (scalar gather; used on non-TPU backends
    and as the correctness oracle)."""
    table = jnp.asarray(table)
    rl = plan.rloc.reshape(plan.ns, plan.K, -1)
    cl = plan.cloc.reshape(plan.ns, plan.K, -1)
    gidx = (plan.base8[:, None, None] * SUB + rl) * LANE + cl
    vals = jnp.where(
        rl >= 0, jnp.take(table, jnp.clip(gidx, 0, plan.n_src - 1), mode="clip"), 0.0
    )
    # gidx can exceed n_src only via masked slots; clip keeps take() in range
    out = vals.sum(axis=1).reshape(plan.ns, plan.S, LANE)
    out_flat = out.reshape(-1)[: plan.n_out]
    return _apply_patches(plan, out_flat, table)


def make_banded_take(plan: BandedTakePlan, dtype=jnp.float32, interpret=False):
    """Compiled Pallas kernel: ``take(table (n_src,)) -> (n_out,)``.

    Grid (ns, R // SUB); per step one (SUB, LANE) window block of the padded
    table is DMAed (base row per chunk via scalar prefetch), the chunk's index
    blocks stay VMEM-resident across steps (their index_map ignores the inner
    grid axis), and the output block accumulates in VMEM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, S, R = plan.K, plan.S, plan.R
    ns, nrows = plan.ns, plan.nrows
    QSTEPS = R // SUB

    def kernel(base_ref, win_ref, r_ref, c_ref, o_ref):
        q = pl.program_id(1)

        @pl.when(q == 0)
        def _init():
            o_ref[...] = jnp.zeros_like(o_ref)

        win = win_ref[...]  # (SUB, LANE)
        acc = o_ref[0]  # (S, LANE)
        for k in range(K):
            c = c_ref[0, k]  # (S, LANE)
            r = r_ref[0, k]
            for a in range(SUB):
                x = jnp.broadcast_to(win[a][None, :], (S, LANE))
                cand = jnp.take_along_axis(x, c, axis=1)
                acc = acc + jnp.where(r == q * SUB + a, cand, 0.0)
        o_ref[0] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ns, QSTEPS),
        in_specs=[
            pl.BlockSpec((SUB, LANE), lambda s, q, base: (base[s] + q, 0)),
            pl.BlockSpec((1, K, S, LANE), lambda s, q, base: (s, 0, 0, 0)),
            pl.BlockSpec((1, K, S, LANE), lambda s, q, base: (s, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, LANE), lambda s, q, base: (s, 0, 0)),
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ns, S, LANE), dtype),
        interpret=interpret,
    )

    pad = plan.nrows * LANE - plan.n_src

    def take(table):
        table = jnp.asarray(table, dtype)
        tp = jnp.concatenate([table, jnp.zeros(pad, dtype)]).reshape(nrows, LANE)
        out = call(plan.base8, tp, plan.rloc, plan.cloc)
        return _apply_patches(plan, out.reshape(-1)[: plan.n_out], table)

    return take


def banded_take(table, plan: BandedTakePlan, interpret=False):
    """Dispatch: Pallas kernel on TPU, XLA fallback elsewhere."""
    if jax.default_backend() == "tpu" or interpret:
        return make_banded_take(plan, jnp.asarray(table).dtype, interpret)(table)
    return banded_take_xla(table, plan)


# --------------------------------------------------------------------------
# Assembly-as-gather planning: the transpose of a dofmap scatter
# --------------------------------------------------------------------------

def plan_slotwise_assembly(dofmap, ndofs, chunk=4096, max_R=96):
    """Plan scatter-add assembly y[dm[e, i]] += vals[i, e] as ONE banded take.

    ``vals`` is expected FEATURE-MAJOR (nd, ne) flattened. For each local slot
    i, the inverse map "cells whose slot i hits dof d" is (ndofs, k_i) in CELL
    space; offsetting slot i's cell indices by i*ne keeps each slot's band
    intact in the flat table. Returns (plan, K_total) or None.
    """
    dm = np.asarray(dofmap)
    ne, nd = dm.shape
    per_slot = []
    kmax_total = 0
    for i in range(nd):
        col = dm[:, i]
        order = np.argsort(col, kind="stable")
        sorted_d = col[order]
        counts = np.bincount(sorted_d, minlength=ndofs)
        k_i = int(counts.max()) if ne else 0
        gm = np.full((ndofs, k_i), -1, np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(ne) - np.repeat(starts, counts)
        gm[sorted_d, within] = order + i * ne  # offset into flat (nd, ne)
        per_slot.append(gm)
        kmax_total += k_i
    idx = np.concatenate(per_slot, axis=1)  # (ndofs, K_total)
    return plan_banded_take(idx, nd * ne, chunk=chunk, max_R=max_R)
