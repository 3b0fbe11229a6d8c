"""Bandwidth-reducing mesh reordering for the banded-gather fast path.

The banded engine's per-output cost is O(element dof-span / 128)
(ops/banded_gather.py), so vertex numbering IS the performance knob on
unstructured meshes. The reference never needs this — PETSc CSR assembly is
ordering-insensitive on CPU (reference dolfinx_materials/quadrature_map.py:
1-14) — but on TPU a banded numbering is what makes lane-gather windows small.

``reorder_mesh`` tries several orderings (natural, reverse Cuthill-McKee,
coordinate snake sort) and keeps the one with the smallest p99 element vertex
span — RCM is NOT always best (on grid-like meshes the natural/row-major
order beats scipy's RCM by 2-4x, measured), and coordinate snakes handle
meshes whose natural numbering is scrambled. Cells are then sorted by their
minimum vertex and their local vertex order is cyclically rotated to balance
slot occupancy (cuts the assembly layer count toward valence/nloc).
"""

from __future__ import annotations

import numpy as np

from ..ops.banded_gather import balance_cell_slots
from .mesh import Mesh


def _elem_span_p99(cells):
    span = cells.max(axis=1) - cells.min(axis=1)
    return float(np.percentile(span, 99))


def _rcm_order(cells, nv):
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    k = cells.shape[1]
    i = np.repeat(cells, k, axis=1).ravel()
    j = np.tile(cells, (1, k)).ravel()
    A = sp.coo_matrix(
        (np.ones(len(i), np.int8), (i, j)), shape=(nv, nv)
    ).tocsr()
    return np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))


def _snake_order(points):
    """Sort vertices into strips along the longest axis, alternating the
    sweep direction (snake) so strip boundaries stay contiguous."""
    pts = np.asarray(points)
    nv, dim = pts.shape
    spans = pts.max(axis=0) - pts.min(axis=0)
    main = int(np.argmax(spans))
    others = [d for d in range(dim) if d != main]
    nstrips = max(1, int(np.sqrt(nv)))
    lo, hi = pts[:, main].min(), pts[:, main].max()
    strip = np.minimum(
        ((pts[:, main] - lo) / max(hi - lo, 1e-300) * nstrips).astype(np.int64),
        nstrips - 1,
    )
    key2 = pts[:, others[0]] if others else np.zeros(nv)
    key2 = np.where(strip % 2 == 0, key2, -key2)  # snake
    key3 = pts[:, others[1]] if len(others) > 1 else np.zeros(nv)
    return np.lexsort((key3, key2, strip))


def reorder_mesh(mesh: Mesh, balance_slots=True, verbose=False):
    """Return a bandwidth-reduced copy of ``mesh`` (or ``mesh`` itself if the
    natural order already wins). Structured meshes (``mesh.grid`` set) are
    returned unchanged — the stencil path does not need this."""
    if mesh.grid is not None:
        return mesh
    if mesh.geom_degree != 1:
        return mesh  # curved meshes keep their geometry-node numbering
    nv = mesh.num_vertices
    candidates = {"natural": np.arange(nv)}
    try:
        candidates["rcm"] = _rcm_order(mesh.cells, nv)
    except Exception:
        pass
    candidates["snake"] = _snake_order(mesh.points)

    best_name, best_perm, best_span = None, None, np.inf
    for name, perm in candidates.items():
        inv = np.empty(nv, np.int64)
        inv[perm] = np.arange(nv)
        span = _elem_span_p99(inv[mesh.cells])
        if span < best_span:
            best_name, best_perm, best_span = name, perm, span
    if verbose:
        print(f"reorder_mesh: '{best_name}' wins, p99 elem span {best_span:.0f}")

    inv = np.empty(nv, np.int64)
    inv[best_perm] = np.arange(nv)
    cells = inv[mesh.cells].astype(np.int32)
    order = np.argsort(cells.min(axis=1), kind="stable")
    cells = cells[order]
    if balance_slots:
        cells = balance_cell_slots(cells, mesh.cell_type)
    out = Mesh(
        mesh.points[best_perm],
        cells.astype(np.int32),
        mesh.cell_type,
    )
    out.reordered = True
    # provenance for callers carrying per-vertex/per-cell data (gmsh tags):
    # new_vertex_id = vertex_inverse[old_id]; new cell c was old cell_order[c]
    out.vertex_perm = np.asarray(best_perm)
    out.vertex_inverse = inv
    out.cell_order = order
    return out
