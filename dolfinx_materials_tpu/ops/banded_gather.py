"""Banded gather: memory-speed unstructured FEM gathers/assembly on TPU.

TPU XLA lowers arbitrary ``v[idx]`` to SCALAR gathers (~0.5M elem/ms measured,
~300x off the HBM roofline — docs/perf.md "Assembly-free SpMV"); structured
grids dodge this with shifted slices, but gmsh meshes and cell subsets cannot.
This module exploits the one fast data-dependent-addressing primitive the VPU
has: the LANE gather (``take_along_axis(x (S,128), c, axis=1)`` -> Mosaic
``tpu.dynamic_gather``), gathering within 128-wide rows.

Algorithm (host-planned; FEM index sets are static):
- reorder the mesh so the dofmap is BANDED (fem/reorder.py picks the best of
  natural / RCM / coordinate orderings by measured element span);
- chunk the output slots; per chunk and per index LAYER k, all indices live in
  a small WINDOW of consecutive 128-wide table rows (own base per (chunk,
  layer) — layers may address disjoint table regions, e.g. the per-slot
  regions of feature-major element values);
- kernel: 3D grid (chunk, layer, window-8-row-block); each step DMAs one
  (8, 128) window block (scalar-prefetched base) and does 8 lane-gathers of
  the broadcast row + selects on (rloc == row). Work per output = O(R) VPU
  lane ops, R ~ bandwidth/128 — no scalar gather anywhere.
- out-of-window outliers (long-range mesh edges) are masked in-kernel and
  patched afterwards by a tiny scalar gather over the recorded positions.

Layered index sets turn SCATTER-ADD assembly into a gather: for local element
slot i, the inverse map "cells whose slot i touches dof d" is a few (ndofs,)
layers indexing CELL space (bandwidth = cell bandwidth), so residual assembly
is one banded take over feature-major (nd, ne) element values. The reference
gets all of this for free from PETSc/FFCx CSR assembly on CPU (reference
dolfinx_materials/quadrature_map.py:1-14); the banded window is the TPU
equivalent of the CSR row cache.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128
SUB = 8  # default window rows streamed per grid step


def _x64_off(dtype):
    """Trace/bind context for the Pallas kernels: x64 disabled for 32-bit
    kernels even when the host program enables x64 (the mixed-precision
    residual path) — take_along_axis and BlockSpec index maps otherwise
    produce int64 internals Mosaic cannot lower. The f64 oracle variant
    (CPU tests) keeps x64 on."""
    import contextlib

    if jnp.dtype(dtype).itemsize <= 4:
        return jax.enable_x64(False)
    return contextlib.nullcontext()


@dataclass
class BandedTakePlan:
    """Host-side plan for out[n] = sum_k table[idx[n, k]] (static idx)."""

    n_out: int
    n_src: int
    K: int
    C: int
    S: int
    ns: int
    R: int  # window rows per (chunk, layer), multiple of sub
    nrows: int  # padded table rows
    sub: int  # window rows streamed per kernel grid step
    base8: jnp.ndarray  # (ns, K) int32 window base in SUB-row units
    rloc: jnp.ndarray  # (ns, K, S, LANE) int32 window row, -1 = masked
    cloc: jnp.ndarray  # (ns, K, S, LANE) int32 lane column in [0, LANE)
    patch_pos: jnp.ndarray  # (npatch,) output positions of outliers
    patch_idx: jnp.ndarray  # (npatch,) table indices of outliers
    frac_patched: float
    nq: jnp.ndarray = None  # (ns, K) int32 OCCUPIED sub-blocks per (chunk, layer)


def plan_banded_take(
    idx, n_src, chunk=1024, max_R=64, max_patch_frac=0.20, row_quantile=0.99,
    sub=SUB,
) -> BandedTakePlan | None:
    """Plan a banded take. ``idx``: (N,) or (N, K) int array, entries in
    [0, n_src) or -1 (skip). Each layer k gets its own per-chunk window.

    ``row_quantile``: R is sized for this quantile of the window-row
    distribution — a handful of long-range outliers (boundary slivers, long
    mesh edges) then go to the scalar patch list instead of inflating every
    chunk's window. Returns None if > ``max_patch_frac`` of entries would
    need patching (index set too unbanded — caller falls back)."""
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
    # (ns, K, C): per-chunk, per-layer index sets
    chunks = idx_p.reshape(ns, C, K).transpose(0, 2, 1)

    valid = chunks >= 0
    big = np.where(valid, chunks, np.int64(1 << 60))
    # ROBUST window base: a low quantile, not the min — one long-range entry
    # (boundary sliver cell) would otherwise drag the base down and inflate
    # every other entry's window row; below-base entries get patched instead
    srt = np.sort(big, axis=2)
    lo_i = max(0, int(round((1.0 - row_quantile) * C)))
    cmin = srt[:, :, lo_i]
    cmin = np.where(cmin == (1 << 60), 0, cmin)
    base8 = (cmin // LANE) // sub

    rel_row = chunks // LANE - (base8 * sub)[:, :, None]
    inside = valid & (rel_row >= 0)
    if inside.any():
        R_q = int(np.quantile(rel_row[inside], row_quantile)) + 1
    else:
        R_q = 1
    R = min(int(max_R), -(-R_q // sub) * sub)
    out_of_window = valid & ((rel_row < 0) | (rel_row >= R))

    keep = valid & ~out_of_window
    rloc = np.where(keep, rel_row, -1).astype(np.int32)
    cloc = np.where(keep, chunks % LANE, 0).astype(np.int32)

    # outlier patch list: (output position, table index)
    oow = out_of_window.transpose(0, 2, 1).reshape(N_pad, K)
    pos_flat = np.nonzero(oow)
    patch_pos = pos_flat[0].astype(np.int32)
    patch_idx = idx_p[pos_flat[0], pos_flat[1]].astype(np.int32)
    frac = len(patch_pos) / max(1, int(valid.sum()))
    if frac > max_patch_frac:
        return None

    nrows = -(-n_src // LANE) + R + sub
    nrows = -(-nrows // sub) * sub
    # occupied sub-blocks per (chunk, layer): the VMEM-resident kernel's
    # per-(chunk, layer) loop bound (the streaming kernel runs the fixed R/sub)
    max_row = np.where(keep, rel_row, -1).max(axis=2)  # (ns, K)
    nq = np.ceil((max_row + 1) / sub).astype(np.int32)
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
        rloc=jnp.asarray(rloc.reshape(ns, K, S, LANE)),
        cloc=jnp.asarray(cloc.reshape(ns, K, S, LANE)),
        patch_pos=jnp.asarray(patch_pos),
        patch_idx=jnp.asarray(patch_idx),
        frac_patched=frac,
        sub=int(sub),
        nq=jnp.asarray(nq),
    )


def _apply_patches(plan: BandedTakePlan, out_flat, table):
    if plan.patch_pos.shape[0]:
        out_flat = out_flat.at[plan.patch_pos].add(table[plan.patch_idx])
    return out_flat


def banded_take_xla(table, plan: BandedTakePlan):
    """Reference/CPU implementation (scalar gather; used on non-TPU backends
    and as the correctness oracle in tests)."""
    table = jnp.asarray(table)
    rl = plan.rloc.reshape(plan.ns, plan.K, -1)
    cl = plan.cloc.reshape(plan.ns, plan.K, -1)
    gidx = (plan.base8[:, :, None] * plan.sub + rl) * LANE + cl
    vals = jnp.where(
        rl >= 0,
        jnp.take(table, jnp.clip(gidx, 0, plan.n_src - 1), mode="clip"),
        0.0,
    )
    out = vals.sum(axis=1).reshape(plan.ns, plan.S, LANE)
    out_flat = out.reshape(-1)[: plan.n_out]
    return _apply_patches(plan, out_flat, table)


def make_banded_take(plan: BandedTakePlan, dtype=jnp.float32, interpret=False):
    """Compiled Pallas kernel: ``take(table (n_src,)) -> (n_out,)``.

    3D grid (chunk, layer, window-block). Per step one (SUB, LANE) window
    block of the padded table is DMAed at the (chunk, layer) scalar-prefetched
    base; the (chunk, layer) index blocks are VMEM-cached across the inner
    axis, and the output block accumulates in VMEM across (layer, block).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, S, R = plan.K, plan.S, plan.R
    ns = plan.ns
    SUBp = plan.sub
    QSTEPS = R // SUBp

    def kernel(base_ref, win_ref, r_ref, c_ref, o_ref):
        # trace under x64=False even when the host program enables x64 (the
        # mixed-precision residual path): take_along_axis otherwise builds
        # int64 index internals, which Mosaic cannot lower. All kernel
        # inputs are int32/f32, so this changes nothing numerically.
        with _x64_off(dtype):
            k = pl.program_id(1)
            q = pl.program_id(2)

            @pl.when(jnp.logical_and(k == 0, q == 0))
            def _init():
                o_ref[...] = jnp.zeros_like(o_ref)

            win = win_ref[...]  # (SUBp, LANE)
            r = r_ref[0, 0]  # (S, LANE)
            c = c_ref[0, 0]
            acc = o_ref[0]
            for a in range(SUBp):
                x = jnp.broadcast_to(win[a][None, :], (S, LANE))
                cand = jnp.take_along_axis(x, c, axis=1)
                acc = acc + jnp.where(r == q * SUBp + a, cand, 0.0)
            o_ref[0] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ns, K, QSTEPS),
        in_specs=[
            pl.BlockSpec((SUBp, LANE), lambda s, k, q, base: (base[s, k] + q, 0)),
            pl.BlockSpec((1, 1, S, LANE), lambda s, k, q, base: (s, k, 0, 0)),
            pl.BlockSpec((1, 1, S, LANE), lambda s, k, q, base: (s, k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, LANE), lambda s, k, q, base: (s, 0, 0)),
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
        tp = jnp.concatenate([table, jnp.zeros(pad, dtype)]).reshape(
            plan.nrows, LANE
        )
        # bind under x64=False even when the host program enables x64 (the
        # mixed-precision residual path): BlockSpec index maps are traced at
        # bind time and would return i64, which Mosaic cannot legalize.
        # Every actual input is int32/f32, so nothing changes numerically.
        with _x64_off(dtype):
            out = call(plan.base8, tp, plan.rloc, plan.cloc)
        return _apply_patches(plan, out.reshape(-1)[: plan.n_out], table)

    return take


#: largest padded table (bytes) routed to the VMEM-resident kernel; leaves
#: headroom in the 16 MB VMEM for index blocks, accumulator and double buffers
VMEM_TABLE_BYTES = 6 << 20


def make_banded_take_vmem(plan: BandedTakePlan, dtype=jnp.float32,
                          interpret=False):
    """VMEM-resident variant of :func:`make_banded_take`.

    The streaming kernel's cost on matvec-sized tables is ~1 us of grid-step
    overhead x (ns * K * R/sub) steps — the window DMAs are tiny (4 KB) and
    latency-bound, and the fixed R/sub schedule pays the p99-sized R on every
    chunk. When the whole padded table fits in VMEM (<= ~6 MB — true for every
    dof vector and most feature-major element-value tables), both costs
    vanish:

    - the table is one constant-index block, DMAed ONCE and kept resident
      across the whole grid (Mosaic revolving-buffer reuse);
    - the grid collapses to one step per CHUNK; layers are an unrolled loop
      and the window walk is a per-(chunk, layer) ``fori_loop`` over only the
      OCCUPIED sub-blocks (``plan.nq``) — the in-kernel schedule the fixed
      grid cannot express — reading window rows by dynamic sublane slice.

    Measured on the v5e (66k-dof Delaunay matvec tables, DIFFERENTIAL chained
    timing — single-dispatch loops carry ~1.8 ms of tunnel dispatch latency
    that swamps kernels this fast): feature-major gather take 0.157 -> 0.086
    ms, assembly take 0.419 -> 0.275 ms; full banded SpMV ~0.89 -> 0.68 ms
    steady-state.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, S = plan.K, plan.S
    ns = plan.ns
    SUBp = plan.sub

    def kernel(base_ref, nq_ref, tab_ref, r_ref, c_ref, o_ref):
        # x64=False for the trace: see make_banded_take's kernel note
        with _x64_off(dtype):
            s = pl.program_id(0)
            acc = jnp.zeros((S, LANE), dtype)
            for k in range(K):
                base = base_ref[s, k]
                nq = nq_ref[s, k]
                r = r_ref[0, k]
                c = c_ref[0, k]

                def body(q, acc):
                    win = tab_ref[pl.ds((base + q) * SUBp, SUBp), :]
                    for a in range(SUBp):
                        x = jnp.broadcast_to(win[a][None, :], (S, LANE))
                        cand = jnp.take_along_axis(x, c, axis=1)
                        acc = acc + jnp.where(r == q * SUBp + a, cand, 0.0)
                    return acc

                acc = jax.lax.fori_loop(0, nq, body, acc)
            o_ref[0] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((plan.nrows, LANE), lambda s, base, nq: (0, 0)),
            pl.BlockSpec((1, K, S, LANE), lambda s, base, nq: (s, 0, 0, 0)),
            pl.BlockSpec((1, K, S, LANE), lambda s, base, nq: (s, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, LANE), lambda s, base, nq: (s, 0, 0)),
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ns, S, LANE), dtype),
        interpret=interpret,
    )

    pad = plan.nrows * LANE - plan.n_src

    # NOTE: the take is often first BUILT inside a jit trace
    # (QuadratureDomain._banded_take caches per dtype), so nothing here may
    # create a jnp value at closure-build time — a captured tracer would leak
    # into later traces. base8/nq ride as two scalar-prefetch call arguments
    # straight from the (concrete, plan-time) plan arrays.
    def take(table):
        table = jnp.asarray(table, dtype)
        tp = jnp.concatenate([table, jnp.zeros(pad, dtype)]).reshape(
            plan.nrows, LANE
        )
        # x64=False at bind time: see make_banded_take's note
        with _x64_off(dtype):
            out = call(plan.base8, plan.nq, tp, plan.rloc, plan.cloc)
        return _apply_patches(plan, out.reshape(-1)[: plan.n_out], table)

    return take


def _best_take(plan: BandedTakePlan, dtype, interpret=False):
    """Kernel selection: VMEM-resident when the padded table fits, streaming
    otherwise. ``plan.nq`` is None for plans pickled before round 3."""
    table_bytes = plan.nrows * LANE * jnp.dtype(dtype).itemsize
    if plan.nq is not None and table_bytes <= VMEM_TABLE_BYTES:
        return make_banded_take_vmem(plan, dtype, interpret)
    return make_banded_take(plan, dtype, interpret)


def banded_take(table, plan: BandedTakePlan, interpret=False):
    """Dispatch: Pallas kernel on TPU, XLA fallback elsewhere."""
    if jax.default_backend() == "tpu" or interpret:
        return _best_take(plan, jnp.asarray(table).dtype, interpret)(table)
    return banded_take_xla(table, plan)


# --------------------------------------------------------------------------
# Assembly-as-gather planning: the transpose of a dofmap scatter
# --------------------------------------------------------------------------

def plan_slotwise_assembly(
    dofmap, ndofs, chunk=1024, max_R=64, k_quantile=0.99, sub=SUB
):
    """Plan scatter-add assembly y[dm[e, i]] += vals[i, e] as ONE banded take.

    ``vals`` is expected FEATURE-MAJOR (nd, ne) flattened. For each local slot
    i, the inverse map "cells whose slot i hits dof d" gives k_i layers of
    (ndofs,) indices into CELL space; offsetting slot i's layers by i*ne
    addresses the flat table, and each layer carries its own per-chunk window
    base so the slot regions stay independent.

    ``k_quantile``: layer count per slot is sized for this quantile of the
    per-dof occurrence counts — the few max-valence vertices spill their
    excess occurrences into the scalar patch list rather than adding a
    near-empty layer to every chunk. Returns the plan or None.
    """
    dm = np.asarray(dofmap)
    ne, nd = dm.shape
    layers = []
    extra_pos, extra_idx = [], []
    for i in range(nd):
        col = dm[:, i]
        order = np.argsort(col, kind="stable")
        sorted_d = col[order]
        counts = np.bincount(sorted_d, minlength=ndofs)
        k_full = int(counts.max()) if ne else 0
        k_i = max(1, int(np.quantile(counts[counts > 0], k_quantile))) if ne else 0
        k_i = min(k_i, k_full)
        gm = np.full((ndofs, k_full), -1, np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(ne) - np.repeat(starts, counts)
        gm[sorted_d, within] = order + i * ne
        if k_i < k_full:
            # overflow occurrences -> patch list
            ov_d, ov_k = np.nonzero(gm[:, k_i:] >= 0)
            extra_pos.append(ov_d.astype(np.int32))
            extra_idx.append(gm[ov_d, k_i + ov_k].astype(np.int32))
            gm = gm[:, :k_i]
        layers.append(gm)
    idx = np.concatenate(layers, axis=1)  # (ndofs, sum_i k_i)
    plan = plan_banded_take(idx, nd * ne, chunk=chunk, max_R=max_R, sub=sub)
    if plan is not None and extra_pos:
        plan.patch_pos = jnp.concatenate(
            [plan.patch_pos] + [jnp.asarray(p) for p in extra_pos]
        )
        plan.patch_idx = jnp.concatenate(
            [plan.patch_idx] + [jnp.asarray(p) for p in extra_idx]
        )
    return plan


def balance_cell_slots(cells, cell_type):
    """Cyclically rotate each cell's vertex list to even out how often each
    vertex lands in each LOCAL slot — the per-slot assembly layer count k_i
    then drops from max-valence toward valence/nloc, directly cutting the
    assembly kernel's layer loop. Orientation-preserving (cyclic) rotations
    only, so the element geometry stays valid for every cell type; greedy
    over cells, O(ne * nloc^2) host-side.
    """
    cells = np.asarray(cells)
    ne, nv = cells.shape
    if cell_type in ("tetrahedron",):
        # only even permutations keep tet orientation; rotations by 1 are odd
        # for 4 vertices — use the 3-cycles fixing vertex 0 plus one double
        # transposition
        perms = np.array(
            [(0, 1, 2, 3), (0, 2, 3, 1), (0, 3, 1, 2), (1, 0, 3, 2)]
        )
    else:
        perms = np.array([np.roll(np.arange(nv), -r) for r in range(nv)])

    # STRIDED batched greedy: process cells in S interleaved strides
    # (cells[k::S]) so a vertex's incident cells — contiguous after the
    # min-dof sort — land in different strides and see each other's count
    # updates. Per stride, score each permutation by the current
    # per-(vertex, slot) occupancy sum, pick the argmin, update counts once.
    # Matches the sequential greedy's layer total (K=18 vs 18 on a 132k-cell
    # Delaunay mesh) at ~65x the speed; a contiguous-batch variant degraded
    # to K=24 because whole incidence groups shared stale counts.
    S = 128
    nvtx = int(cells.max()) + 1
    slot_count = np.zeros((nvtx, nv), np.int32)
    out = np.empty_like(cells)
    arange_nv = np.arange(nv)
    for k in range(min(S, ne)):
        idx = np.arange(k, ne, S)
        cand = cells[idx][:, perms]  # (b, nperm, nv)
        scores = slot_count[cand, arange_nv].sum(axis=2)  # (b, nperm)
        best = np.argmin(scores, axis=1)
        chosen = np.take_along_axis(
            cand, best[:, None, None], axis=1
        )[:, 0]
        out[idx] = chosen
        np.add.at(slot_count, (chosen, arange_nv), 1)
    return out.astype(cells.dtype)
