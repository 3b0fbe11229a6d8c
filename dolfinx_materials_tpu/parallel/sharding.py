"""SPMD kernels: sharded constitutive updates and a fully-fused Newton load step.

Design (TPU-first, replacing reference MPI patterns):

- **Constitutive update** (the hot path): the Gauss-point axis is sharded; each
  device runs the identical vmapped point kernel on its slice. No communication —
  the exact analogue of the reference's rank-local ``mgis_bv.integrate`` loops
  (mfront.py:264-285), but over ICI-connected chips.
- **Newton load step**: cells (and their state) sharded, dof vectors replicated.
  Per device: gather local element dofs -> evaluate gradients -> batched material
  update -> element residuals/matrices -> local scatter-add -> ``psum`` over the
  mesh axis. The linear solve is an early-exiting budgeted CG preconditioned by
  a node-block Jacobi smoother (vector problems) plus a frozen two-level coarse
  correction; its matvec does one psum per application. Everything is ``lax``
  control flow with static shapes: ONE jittable function = one XLA program per
  load step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map


def device_mesh(n_devices=None, axis="cells", devices=None):
    """1-axis device mesh, or a MULTI-AXIS mesh when ``axis`` is a tuple of
    names and ``n_devices`` a matching tuple of sizes — e.g.
    ``device_mesh((2, 4), ("dcn", "ici"))`` for the multi-host layout: the
    slow outer axis (data-center network) times the fast inner axis
    (intra-pod ICI). Every kernel in this module accepts the same tuple as
    its ``axis`` argument; XLA then lowers each collective hierarchically
    (ICI stage first, DCN stage on the reduced data)."""
    devices = devices if devices is not None else jax.devices()
    if isinstance(axis, (tuple, list)):
        sizes = tuple(int(s) for s in n_devices)
        devices = devices[: int(np.prod(sizes))]
        return Mesh(np.array(devices).reshape(sizes), tuple(axis))
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def _axis_size(mesh: Mesh, axis):
    """Total shard count of ``axis`` (a name or tuple of names)."""
    if isinstance(axis, (tuple, list)):
        return int(np.prod([mesh.shape[a] for a in axis]))
    return mesh.shape[axis]


def _pbicgstab(Av, b, M, maxiter, tol, atol=0.0):
    """Left-preconditioned BiCGStab as a plain ``lax.while_loop``.

    Same algorithm (and stopping rule: |r|^2 <= max(tol*|b|, atol)^2) as
    ``jax.scipy.sparse.linalg.bicgstab``, but WITHOUT the
    ``lax.custom_linear_solve`` wrapper — that wrapper eagerly transposes the
    matvec jaxpr, and the banded lane-gather Pallas kernels inside the fused
    steps' matvecs have no transpose rule (the CPU oracle path does, which is
    why this only bites on TPU). Breakdown (rho or omega ~ 0) exits early;
    the caller's nonfinite guard handles the rest."""
    x0 = jnp.zeros_like(b)
    r0 = b
    bs = jnp.maximum(tol * _norm2(b), atol) ** 2
    eps = jnp.asarray(jnp.finfo(b.dtype).eps, b.dtype)

    def cond(st):
        x, r, rhat, alpha, omega, rho, p, q, k = st
        return (jnp.vdot(r, r).real > bs) & (k < maxiter) & (jnp.abs(rho) > 0)

    def body(st):
        x, r, rhat, alpha, omega, rho, p, q, k = st
        rho_ = jnp.vdot(rhat, r)
        beta = (rho_ / jnp.where(rho == 0, eps, rho)) * (
            alpha / jnp.where(omega == 0, eps, omega)
        )
        p_ = r + beta * (p - omega * q)
        phat = M(p_)
        q_ = Av(phat)
        denom = jnp.vdot(rhat, q_)
        alpha_ = rho_ / jnp.where(denom == 0, eps, denom)
        s = r - alpha_ * q_
        shat = M(s)
        t = Av(shat)
        tt = jnp.vdot(t, t)
        omega_ = jnp.vdot(t, s) / jnp.where(tt == 0, eps, tt)
        x_ = x + alpha_ * phat + omega_ * shat
        r_ = s - omega_ * t
        return (x_, r_, rhat, alpha_, omega_, rho_, p_, q_, k + 1)

    one = jnp.asarray(1.0, b.dtype)
    st = (x0, r0, r0, one, one, one, x0, x0, 0)
    x, *_ = jax.lax.while_loop(cond, body, st)
    return x


def _norm2(v):
    return jnp.sqrt(jnp.vdot(v, v).real)


def pad_to_multiple(arr, m, axis=0, fill=0):
    """Pad ``axis`` to a multiple of ``m`` (static shapes across shards)."""
    n = arr.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return arr, n
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    if isinstance(arr, np.ndarray):
        return np.pad(arr, widths, constant_values=fill), n
    return jnp.pad(arr, widths, constant_values=fill), n


def make_sharded_constitutive_update(material, mesh: Mesh, axis="cells"):
    """Jitted sharded batched update: (x (n, nin), state pytree, dt) -> outputs.

    ``n`` must be divisible by the mesh size (use :func:`pad_to_multiple`).
    Zero collectives: the point axis is embarrassingly parallel. ``axis`` may
    be a tuple of mesh axes (multi-host dcn x ici layout, :func:`device_mesh`).
    """
    axis = tuple(axis) if isinstance(axis, (tuple, list)) else axis
    point_update = material._point_update

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), None),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    def _update(x, state, dt):
        return jax.vmap(lambda xi, si: point_update(xi, {}, si, dt))(x, state)

    return jax.jit(_update)


def _sym_block_inv(Bm, eye):
    """SPD-preserving inverse of the (n, ncomp, ncomp) node blocks of the
    Jacobi smoother.

    A plain f32 ``jnp.linalg.inv`` of near-incompressible tangent blocks
    (K/mu ~ 2500, e.g. the Ogden K=1e9 protocol) returns inverses whose
    asymmetry/indefiniteness breaks CG's M-SPD requirement — measured on the
    P2-tet bench protocol the fused step DIVERGED from load step 3 (|R| ->
    1e19) while scalar Jacobi converged. Two standard stabilizations fix it:

    - Jacobi pre-scaling: invert ``D^-1/2 B D^-1/2`` (condition bounded by
      the block's internal coupling, not its absolute scale), then unscale;
    - explicit symmetrization of both the scaled block and the result (the
      exact block is symmetric; assembly round-off is not).
    """
    d = jnp.abs(jnp.einsum("naa->na", Bm))
    s = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-30))
    Bs = Bm * s[:, :, None] * s[:, None, :]
    Bs = 0.5 * (Bs + jnp.swapaxes(Bs, 1, 2))
    Binv = jnp.linalg.inv(Bs)
    Binv = 0.5 * (Binv + jnp.swapaxes(Binv, 1, 2))
    return Binv * s[:, :, None] * s[:, None, :]


def _coord_agg_cdofs(space, pc_boxes, budget=2048):
    """Coordinate-box node aggregates over a space (the host solver's
    ``_node_aggregates`` scheme, solvers.py): returns ``(ncoarse,
    cdof_of_dof (ndofs,))`` with the coarse-dof budget ``nagg*ncomp <=
    ~budget`` so the frozen dense coarse inverse stays one small matmul."""
    coords = np.asarray(space.node_coords, dtype=np.float64)
    ncomp = space.ncomp
    nnodes, dim = coords.shape
    lo = coords.min(axis=0)
    span = np.maximum(coords.max(axis=0) - lo, 1e-30)
    target = max(1, min(budget // ncomp, nnodes))
    b = max(1, min(int(pc_boxes), int(np.floor(target ** (1.0 / dim)))))
    qz = np.minimum((coords - lo) / span * b, b - 1).astype(np.int64)
    keys = qz[:, 0]
    for d in range(1, dim):
        keys = keys * b + qz[:, d]
    _, agg = np.unique(keys, return_inverse=True)
    nagg = int(agg.max()) + 1
    cdof_of_dof = (
        agg[:, None] * ncomp + np.arange(ncomp)[None, :]
    ).reshape(-1)
    return nagg * ncomp, cdof_of_dof


def _coord_agg_modes(space, pc_boxes, budget=3072, modes="trans", labels=None):
    """Coordinate-box NODE aggregates with per-aggregate coarse mode weights.

    Generalizes :func:`_coord_agg_cdofs` to richer (and high-contrast-robust)
    coarse spaces:

    - ``modes="trans"``: ``ncomp`` piecewise-constant modes per aggregate —
      the classic scheme, identical span to ``_coord_agg_cdofs``;
    - ``modes="rbm"``: per-aggregate RIGID-BODY modes on vector spaces —
      ``ncomp`` translations plus rotations (1 in 2D, 3 in 3D) about the
      aggregate centroid. This is the standard elasticity near-nullspace the
      reference's GAMG consumes from PETSc (SURVEY.md §2.2 PETSc row) and the
      classical cure for quasi-rigid inclusions: a stiff body's rigid motion
      is exactly representable per aggregate, so the two-level CG does not
      grind against the penalty stiffness (the reference composite's
      E_pen=1e12 SVK spheres, hyperelasticity.py:186).

    ``labels``: optional ``(nnodes,)`` integer node labels; aggregates never
    mix labels (e.g. matrix vs inclusion membership), so each inclusion gets
    aggregates of its own and its rigid modes jump only across the physical
    interface.

    Returns ``(ncoarse, agg_of_node (nnodes,), W_node (nnodes, ncomp,
    nmodes) float32)`` with ``ncoarse = nagg * nmodes <= ~budget``.
    """
    coords = np.asarray(space.node_coords, dtype=np.float64)
    ncomp = space.ncomp
    nnodes, dim = coords.shape
    if modes == "rbm" and ncomp != dim:
        raise ValueError(
            f"rbm coarse modes need a {dim}-component space, got ncomp={ncomp}"
        )
    nrot = 0 if modes == "trans" else (1 if dim == 2 else 3)
    nmodes = ncomp + nrot
    lo = coords.min(axis=0)
    span = np.maximum(coords.max(axis=0) - lo, 1e-30)
    target = max(1, min(budget // nmodes, nnodes))
    b = max(1, min(int(pc_boxes), int(np.floor(target ** (1.0 / dim)))))
    qz = np.minimum((coords - lo) / span * b, b - 1).astype(np.int64)
    keys = qz[:, 0]
    for d in range(1, dim):
        keys = keys * b + qz[:, d]
    if labels is not None:
        labels = np.asarray(labels, np.int64)
        keys = keys * (labels.max() + 1) + labels
    _, agg = np.unique(keys, return_inverse=True)
    agg = agg.astype(np.int32)
    nagg = int(agg.max()) + 1

    W = np.zeros((nnodes, ncomp, nmodes), np.float64)
    for c in range(ncomp):
        W[:, c, c] = 1.0
    if nrot:
        # centroid-centered, span-normalized rotations (conditioning of Ac)
        cnt = np.bincount(agg, minlength=nagg).astype(np.float64)
        cen = np.stack(
            [np.bincount(agg, coords[:, d], nagg) / cnt for d in range(dim)],
            axis=1,
        )
        r = (coords - cen[agg]) / float(np.max(span))
        if dim == 2:
            W[:, 0, ncomp] = -r[:, 1]
            W[:, 1, ncomp] = r[:, 0]
        else:
            # mode ncomp+a = rotation about axis a: w = e_a x r
            W[:, 1, ncomp + 0] = -r[:, 2]
            W[:, 2, ncomp + 0] = r[:, 1]
            W[:, 0, ncomp + 1] = r[:, 2]
            W[:, 2, ncomp + 1] = -r[:, 0]
            W[:, 0, ncomp + 2] = -r[:, 1]
            W[:, 1, ncomp + 2] = r[:, 0]
    return nagg * nmodes, agg, W.astype(np.float32)


def _p1_coarse(space):
    """Geometric P2->P1 coarse space on simplex meshes.

    Coarse dofs are the MESH VERTEX dofs; the interpolation weight of coarse
    vertex v at P2 node n is the P1 hat function value there — vertex nodes
    map to themselves, edge nodes take half of each edge endpoint. Unlike the
    coordinate-box aggregates the coarse basis is CONTINUOUS, so the
    two-level CG gets the geometric-multigrid energy bound instead of the
    unsmoothed-aggregation one (measured on the tet-P2 Ogden tangent:
    1e-3 in ~40 PCG its vs 132 for box-RBM, tools/_pc_proto results in
    docs/perf.md). This is the TPU answer to the reference's GAMG hierarchy
    on the same problem (reference demos/mfront/hyperelasticity:220-229).

    Uses the CANONICAL node layout (vertices first, then edge nodes —
    fem/space.py) mapped through ``space.node_renum``; no geometry matching.

    Returns ``(ncoarse, parents (nnodes, 2) int32 vertex ids, pw (nnodes, 2)
    float32, vid_of_node (nnodes,) int32 — vertex id of vertex nodes, -1
    elsewhere, Wp1 (nloc, nvloc) float32 — P1 value of each local vertex at
    each local node)``.
    """
    from ..fem.element import EDGES

    mesh = space.mesh
    if space.degree != 2 or mesh.cell_type not in ("triangle", "tetrahedron"):
        raise NotImplementedError(
            "coarse_modes='p1' needs a P2 simplex space "
            f"(got P{space.degree} {mesh.cell_type})"
        )
    nv = mesh.num_vertices
    edge_verts, _ = mesh.edges()
    nnodes = space.num_nodes
    parents = np.empty((nnodes, 2), np.int64)
    parents[:nv, 0] = np.arange(nv)
    parents[:nv, 1] = np.arange(nv)
    parents[nv:] = edge_verts
    pw = np.zeros((nnodes, 2), np.float32)
    pw[:nv, 0] = 1.0
    pw[nv:] = 0.5
    vid = np.full(nnodes, -1, np.int64)
    vid[:nv] = np.arange(nv)
    renum = space.node_renum
    if renum is not None:
        p2, w2, v2 = (np.empty_like(parents), np.empty_like(pw),
                      np.empty_like(vid))
        p2[renum], w2[renum], v2[renum] = parents, pw, vid
        parents, pw, vid = p2, w2, v2
    nvloc = mesh.cells.shape[1]
    Wp1 = np.zeros((space.nloc, nvloc), np.float32)
    for a in range(nvloc):
        Wp1[a, a] = 1.0
    for i, (a, b) in enumerate(EDGES[mesh.cell_type]):
        Wp1[nvloc + i, a] = 0.5
        Wp1[nvloc + i, b] = 0.5
    return (nv * space.ncomp, parents.astype(np.int32), pw,
            vid.astype(np.int32), Wp1)


def make_sharded_newton_step(
    qmap,
    problem,
    mesh: Mesh,
    axis="cells",
    n_newton=10,
    n_cg=60,
    n_backtracks=10,
    rtol=None,
    atol=0.0,
    shard_dofs=False,
    pc="two_level",
    pc_boxes=8,
    use_stencil=True,
    use_banded=True,
    cg_rtol=1e-8,
    smoother=None,
):
    """Build a fully-fused, sharded Newton load step for a single-material
    mechanics problem (one registered gradient, default flux.dgrad residual).

    Returns ``step(u, internal_state, bc_mask, bc_vals, dt) ->
    (u_new, new_internal_state (trimmed to real points), res_norm)`` —
    jittable, runs entirely on device, cells sharded over ``mesh``.

    Robustness (VERDICT r1 item 6): the Newton loop is an early-exiting
    ``lax.while_loop`` — it stops as soon as |R| <= rtol*|R0| + atol instead of
    burning (and possibly destabilizing on) fixed leftover iterations; each
    iteration backtracks on the flux-only residual. Handles the sharp-Voce
    flagship material (tests/test_sharding.py). The inner CG early-exits the
    same way: ``n_cg`` is a budget, and iterations stop once the
    preconditioned residual drops ``cg_rtol`` relative to its entering value
    — late Newton iterations (whose entering u is already close) then cost a
    handful of matvecs instead of the full budget. The default 1e-8 is at
    the f32 floor, i.e. pure savings with no accuracy change; raise it
    (1e-3..1e-2) for inexact-Newton configurations.

    Multi-host readiness: ``axis`` may be a TUPLE of mesh axes (e.g.
    ``("dcn", "ici")`` from ``device_mesh((n_hosts, n_chips), ...)``) — cells
    shard over the full device grid and every collective (all_gather /
    psum_scatter / psum) names both axes, which XLA lowers hierarchically so
    the wide dof traffic rides ICI within a host-group and only the reduced
    stage crosses DCN. Validated on a virtual 2 x 4 mesh (tests/test_sharding.py).

    Preconditioning: ``pc="two_level"`` (default) adds a FROZEN two-level
    correction to the Jacobi-CG — the coarse operator P^T K(u0) P over
    ``pc_boxes``-per-axis node boxes is assembled and dense-INVERTED once per
    step from the entering tangent (triangular LU solves are sequential
    ~ms-latency ops on TPU; the per-iteration coarse apply must be one small
    matmul). On structured grids the restriction/prolongation are pure
    reshape-reduces (no gathers); on UNSTRUCTURED meshes the coarse space is
    built from coordinate-box node aggregates (the host solver's
    ``_node_aggregates`` scheme) with a segment-sum restriction and a
    table-gather prolongation — (ndofs,)-sized scalar ops once per CG
    iteration, negligible next to the matvec. Cuts the CG iterations needed
    for stiff/elongated meshes by ~5x at BETTER residuals (docs/perf.md), and
    on stiff 3D unstructured tangents (near-incompressible Ogden, K/mu ~2500,
    P2 tets) it is the difference between converging and not;
    ``pc="jacobi"`` restores the plain smoother. Under ``shard_dofs`` the
    structured coarse restriction is gather-free: the local slice is
    box-reduced in place and only the (ncoarse,) partial sums are psummed.

    Scaling (VERDICT r1 item 9): with ``shard_dofs=True`` the dof vectors
    (u, R, CG workspace, bc arrays) are SHARDED over the mesh axis instead of
    replicated: per-matvec traffic is one ``all_gather`` (transient full
    vector for the cell gather) + one ``psum_scatter`` (assembled shard), the
    standard sequence-parallel pattern riding ICI. Persistent per-device dof
    memory drops from O(ndofs) to O(ndofs / n_devices). CAVEAT: on structured
    meshes the stencil fast path materializes full-grid (ne_pad, ndof_el)
    element transients on every device inside the gather/scatter, so the
    TRANSIENT footprint stays O(ne) per device even with ``shard_dofs=True``
    (persistent state is still sharded); pass ``use_stencil=False`` to force
    the sharded dofmap-gather path when that transient is the binding memory
    constraint.
    """
    dom = qmap.domain
    material = qmap.material
    axis = tuple(axis) if isinstance(axis, (tuple, list)) else axis
    ndev = _axis_size(mesh, axis)
    gname = material.gradient_names[0]
    fname = material.flux_names[0]
    expr = qmap.gradient_exprs[gname]
    point_update = material._point_update
    behavior = material.behavior
    if rtol is None:
        import jax.numpy as _jnp

        rtol = 1e-10 if float(_jnp.finfo(_jnp.zeros(0).dtype).eps) < 1e-9 else 1e-6

    def point_flux(x, state, dt):
        """Flux-only evaluation (no tangent) for line-search residual trials."""
        flux_dict, new_state = behavior.constitutive_update({gname: x}, state, dt)
        return flux_dict[fname], new_state

    nloc, ncomp, nq = dom.nloc, dom.ncomp, dom.nq
    N_tab = dom.N
    ndofs = qmap.space.num_dofs
    # pad sharded dof vectors to a multiple of ndev*ncomp so a node's dof
    # BLOCK never straddles a shard boundary (the node-block smoother
    # applies (ncomp, ncomp) inverses per node on the local slice)
    nd_p = ndofs + ((-ndofs) % (ndev * ncomp)) if shard_dofs else ndofs
    # smoother: node-block Jacobi by default on 3D VECTOR problems only —
    # it couples the per-node components the scalar diagonal ignores and
    # measurably improves CG rates on near-incompressible 3D tangents, but
    # on 2D compressible plates it matches Jacobi's quality at +33% step
    # cost (measured on the benched 64x64 J2 plate: 52.6 -> 69.7 ms for an
    # identical residual). smoother="block"/"jacobi" overrides either way.
    if smoother not in (None, "jacobi", "block"):
        raise ValueError(
            f"smoother must be None, 'jacobi' or 'block', got {smoother!r}"
        )
    use_block_smoother = (
        smoother or ("block" if ncomp >= 3 else "jacobi")
    ) == "block" and ncomp > 1

    # --- stencil fast path (structured P1 grids) -------------------------
    # per-CG-matvec dof gathers/scatter-adds are TPU scalar ops ~300x off the
    # memory roofline (docs/perf.md "Assembly-free SpMV"). On structured grids
    # every device instead runs the FULL-grid shifted-slice gather/scatter
    # (redundant across shards but memory-speed) while the expensive
    # per-element work stays sharded. None -> general dofmap path (gmsh).
    stencil = getattr(dom, "_stencil", None) if use_stencil else None
    # banded lane-gather engine on UNSTRUCTURED meshes (same redundant-full
    # pattern as the stencil path: every device runs the full banded
    # gather/assembly at memory speed, the per-element work stays sharded) —
    # ops/banded_gather.py; dispatches to the XLA oracle off-TPU
    banded = (
        dom
        if (use_banded and stencil is None and getattr(dom, "_banded", None))
        else None
    )

    # --- shard-ready (padded) tables -------------------------------------
    dNdx, ne_real = pad_to_multiple(np.asarray(dom.dNdx), ndev)
    wdetJ, _ = pad_to_multiple(np.asarray(dom.wdetJ), ndev)  # padded cells: w=0
    x_q, _ = pad_to_multiple(np.asarray(dom.x_q), ndev)
    dofmap, _ = pad_to_multiple(np.asarray(dom.dofmap), ndev)  # pad -> dof 0, w=0 ok
    tables = (jnp.asarray(dNdx), jnp.asarray(wdetJ), jnp.asarray(x_q),
              jnp.asarray(dofmap))  # + cdof table appended after coarse setup

    init_tpl = behavior.init_state()  # per-point template pytree

    def pad_state(state):
        """Pad the point axis to a shard multiple with the behavior's
        INIT-STATE values, not zeros: identity-initialized ISVs (FeFp
        be/F_prev) would otherwise make padded points compute inv33(0) ->
        inf, and 0 * inf = NaN survives the zero-weight masking of padded
        cells, poisoning the residual norm."""

        def pad_leaf(a, tpl):
            a = jnp.asarray(a)
            pad = (-a.shape[0]) % (ndev * nq)
            if pad == 0:
                return a
            fill = jnp.broadcast_to(
                jnp.asarray(tpl, a.dtype), (pad,) + a.shape[1:]
            )
            return jnp.concatenate([a, fill])

        return jax.tree.map(pad_leaf, state, init_tpl)

    from ..fem.forms import Ctx

    def cell_eval(ue, d, x):
        un = ue.reshape(nloc, ncomp)
        u_q = N_tab @ un
        g_q = jnp.einsum("qvi,vc->qci", d, un)
        return jax.vmap(lambda u_, g_, x_: expr(Ctx(u_, g_, x_)))(u_q, g_q, x)

    fast_update = material._fast_update  # whole-batch fast path (J2 analytic,
    fast_flux = material._fast_flux      # FeFp/crystal feature-major) or None

    def local_kernels(u_e, dNdx_l, wdetJ_l, x_q_l, state_l, dt):
        """Per-device: material update + element residual/matrices on local
        cells — through the behavior's whole-batch fast path when it has one
        (the same dispatch Material.integrate uses)."""
        grads = jax.vmap(cell_eval)(u_e, dNdx_l, x_q_l)  # (ne_l, nq, size)
        gsize = grads.shape[-1]
        x_flat = grads.reshape(-1, gsize)
        if fast_update is not None:
            flux, Ct, new_state = fast_update(x_flat, state_l, dt)
            Ct = Ct.reshape(x_flat.shape[0], gsize, gsize)
        else:
            flux, Ct, new_state = jax.vmap(
                lambda xi, si: point_update(xi, {}, si, dt)
            )(x_flat, state_l)
        ne_l = u_e.shape[0]
        flux_e = flux.reshape(ne_l, nq, -1)
        C_e = Ct.reshape(ne_l, nq, gsize, gsize)

        def cell_r(ue, d, x, w, fl):
            def work(w_):
                g = cell_eval(w_, d, x)
                return jnp.sum(w[:, None] * g * fl)

            return jax.grad(work)(ue)

        r_e = jax.vmap(cell_r)(u_e, dNdx_l, x_q_l, wdetJ_l, flux_e)

        def cell_K(ue, d, x, w, fl, C):
            B = jax.jacfwd(lambda w_: cell_eval(w_, d, x))(ue)
            K = jnp.einsum("qai,qab,qbj,q->ij", B, C, B, w)

            def work(w_):
                g = cell_eval(w_, d, x)
                return jnp.sum(w[:, None] * g * fl)

            return K + jax.hessian(work)(ue)

        K_e = jax.vmap(cell_K)(u_e, dNdx_l, x_q_l, wdetJ_l, flux_e, C_e)
        return r_e, K_e, new_state

    ne_pad = dNdx.shape[0]
    ne_local = ne_pad // ndev
    ne_cells = dom.ne
    ndof_el = nloc * ncomp
    if stencil is not None:
        corners = (
            dom._CORNERS_2D if len(stencil) == 2 else dom._CORNERS_3D
        )
        grid_shape = tuple(g + 1 for g in stencil) + (ncomp,)

    def shard_index():
        if isinstance(axis, tuple):
            s = jax.lax.axis_index(axis[0])
            for a in axis[1:]:
                s = s * mesh.shape[a] + jax.lax.axis_index(a)
            return s
        return jax.lax.axis_index(axis)

    def stencil_gather_local(u_full):
        """(ndofs,) -> this shard's (ne_local, ndof_el) element dofs via
        full-grid shifted slices + one dynamic slice."""
        u2 = u_full[:ndofs].reshape(grid_shape)
        if len(stencil) == 2:
            nx, ny = stencil
            parts = [
                u2[di : di + nx, dj : dj + ny].reshape(ne_cells, ncomp)
                for (di, dj) in corners
            ]
        else:
            nx, ny, nz = stencil
            parts = [
                u2[di : di + nx, dj : dj + ny, dk : dk + nz].reshape(
                    ne_cells, ncomp
                )
                for (di, dj, dk) in corners
            ]
        ue = jnp.concatenate(parts, axis=1)  # (ne_cells, ndof_el)
        if ne_pad != ne_cells:
            ue = jnp.concatenate(
                [ue, jnp.zeros((ne_pad - ne_cells, ndof_el), ue.dtype)]
            )
        return jax.lax.dynamic_slice_in_dim(
            ue, (shard_index() * ne_local).astype(jnp.int32), ne_local
        )

    def stencil_scatter_partial(vals_e, dtype):
        """This shard's (ne_local, ndof_el) element values -> its PARTIAL
        (ndofs,) assembled vector via slice-adds (caller psums)."""
        all_vals = jnp.zeros((ne_pad, ndof_el), dtype)
        start = (shard_index() * ne_local).astype(jnp.int32)
        all_vals = jax.lax.dynamic_update_slice(
            all_vals, vals_e.astype(dtype), (start, jnp.int32(0))
        )
        v = all_vals[:ne_cells].reshape(
            (ne_cells, nloc, ncomp)
        )
        y = jnp.zeros(grid_shape, dtype)
        if len(stencil) == 2:
            nx, ny = stencil
            vv = v.reshape(nx, ny, nloc, ncomp)
            for k, (di, dj) in enumerate(corners):
                y = y.at[di : di + nx, dj : dj + ny].add(vv[:, :, k])
        else:
            nx, ny, nz = stencil
            vv = v.reshape(nx, ny, nz, nloc, ncomp)
            for k, (di, dj, dk) in enumerate(corners):
                y = y.at[di : di + nx, dj : dj + ny, dk : dk + nz].add(
                    vv[:, :, :, k]
                )
        return y.reshape(-1)

    # --- frozen two-level coarse space -------------------------------------
    # structured grids: node boxes with reshape-reduce transfers (gather-free);
    # unstructured meshes: coordinate-box node aggregates (the host solver's
    # _node_aggregates scheme) with segment-sum restriction / table-gather
    # prolongation — the (ndofs,)-sized scalar scatter/gather per CG iteration
    # is ~us-scale at these sizes, and without the coarse correction the
    # Jacobi-CG directions on stiff 3D unstructured tangents (K/mu ~ 2500)
    # are too inexact for Newton to converge at all (P2-tet Ogden, N >= 8).
    two_level = pc == "two_level"
    if two_level and stencil is not None:
        nodes_per_axis = tuple(g + 1 for g in stencil)
        nb = tuple(min(pc_boxes, na) for na in nodes_per_axis)
        bsz = tuple(-(-na // b) for na, b in zip(nodes_per_axis, nb))  # ceil
        gpad = tuple(b * s - na for na, b, s in zip(nodes_per_axis, nb, bsz))
        nagg = int(np.prod(nb))
        ncoarse = nagg * ncomp
        # coarse dof of every global dof (host): node (i,j[,k]) -> box
        node_idx = np.indices(nodes_per_axis).reshape(len(stencil), -1)
        box = 0
        for d in range(len(stencil)):
            box = box * nb[d] + np.minimum(node_idx[d] // bsz[d], nb[d] - 1)
        cdof_of_dof = (
            box[:, None] * ncomp + np.arange(ncomp)[None, :]
        ).reshape(-1)
        dofmap_host = np.asarray(dofmap)  # (ne_pad, ndof_el), pads -> dof 0
        cdof_table = jnp.asarray(
            cdof_of_dof[dofmap_host].astype(np.int32)
        )  # (ne_pad, ndof_el)

        def restrict_full(r_full):
            """(>= ndofs,) replicated residual -> (ncoarse,) box sums —
            reshape-reduce, no gathers."""
            g = r_full[:ndofs].reshape(nodes_per_axis + (ncomp,))
            g = jnp.pad(g, [(0, p) for p in gpad] + [(0, 0)])
            if len(stencil) == 2:
                rc = g.reshape(
                    nb[0], bsz[0], nb[1], bsz[1], ncomp
                ).sum(axis=(1, 3))
            else:
                rc = g.reshape(
                    nb[0], bsz[0], nb[1], bsz[1], nb[2], bsz[2], ncomp
                ).sum(axis=(1, 3, 5))
            return rc.reshape(-1)

        def prolong_full(wc):
            """(ncoarse,) -> (ndofs,) piecewise-constant prolongation."""
            if len(stencil) == 2:
                g = jnp.broadcast_to(
                    wc.reshape(nb[0], 1, nb[1], 1, ncomp),
                    (nb[0], bsz[0], nb[1], bsz[1], ncomp),
                ).reshape(nb[0] * bsz[0], nb[1] * bsz[1], ncomp)
                g = g[: nodes_per_axis[0], : nodes_per_axis[1]]
            else:
                g = jnp.broadcast_to(
                    wc.reshape(nb[0], 1, nb[1], 1, nb[2], 1, ncomp),
                    (nb[0], bsz[0], nb[1], bsz[1], nb[2], bsz[2], ncomp),
                ).reshape(
                    nb[0] * bsz[0], nb[1] * bsz[1], nb[2] * bsz[2], ncomp
                )
                g = g[
                    : nodes_per_axis[0], : nodes_per_axis[1],
                    : nodes_per_axis[2],
                ]
            return g.reshape(-1)

    elif two_level:
        # UNSTRUCTURED meshes: coordinate-box node aggregates (the host
        # solver's _node_aggregates scheme, solvers.py). Restriction is a
        # segment-sum over the dof -> aggregate map and prolongation a gather
        # from the (ncoarse,) coarse vector — (ndofs,)-sized scalar ops once
        # per CG iteration, negligible next to the matvec.
        ncoarse, cdof_of_dof = _coord_agg_cdofs(qmap.space, pc_boxes)
        cdof_ids = jnp.asarray(cdof_of_dof.astype(np.int32))
        dofmap_host = np.asarray(dofmap)  # pads -> dof 0 (zero K_e rows)
        cdof_table = jnp.asarray(cdof_of_dof[dofmap_host].astype(np.int32))

        def restrict_full(r_full):
            return jax.ops.segment_sum(
                r_full[:ndofs], cdof_ids, num_segments=ncoarse
            )

        def prolong_full(wc):
            return wc[cdof_ids]

    else:
        ncoarse = 1
        cdof_table = jnp.zeros_like(jnp.asarray(dofmap))

    tables = tables + (cdof_table,)

    u_spec = P(axis) if shard_dofs else P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(u_spec, P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  u_spec, u_spec, P()),
        out_specs=(u_spec, P(axis), P()),
        # pallas_call (banded engine) inside shard_map cannot annotate its
        # outputs' varying-across-mesh state; skip the check (the collectives
        # here are explicit psums/all_gathers, validated by equivalence tests)
        check_vma=False,
    )
    def _step(u, dNdx_l, wdetJ_l, x_q_l, dofmap_l, cdof_l, state_l, bc_mask,
              bc_vals, dt):
        # --- dof-layout helpers ------------------------------------------
        def gather_cells(u_full):
            """Full dof vector -> this shard's (ne_l, ndof_el) element dofs:
            shifted-slice stencil on structured grids, banded lane-gather on
            unstructured meshes, dofmap gather as the last resort (scalar
            gathers, ~300x off roofline — docs/perf.md)."""
            if stencil is not None:
                return stencil_gather_local(u_full)
            if banded is not None:
                ue = banded._banded_take("cell", u_full[:ndofs]).reshape(
                    ne_cells, ndof_el
                )
                if ne_pad != ne_cells:
                    ue = jnp.concatenate(
                        [ue, jnp.zeros((ne_pad - ne_cells, ndof_el), ue.dtype)]
                    )
                return jax.lax.dynamic_slice_in_dim(
                    ue, (shard_index() * ne_local).astype(jnp.int32), ne_local
                )
            return u_full[dofmap_l]

        def partial_assemble(vals_e, dtype, size):
            if stencil is not None:
                part = stencil_scatter_partial(vals_e, dtype)
                if size != ndofs:
                    part = jnp.concatenate(
                        [part, jnp.zeros(size - ndofs, dtype)]
                    )
                return part
            if banded is not None:
                all_vals = jax.lax.dynamic_update_slice(
                    jnp.zeros((ne_pad, ndof_el), dtype),
                    vals_e.astype(dtype),
                    ((shard_index() * ne_local).astype(jnp.int32), jnp.int32(0)),
                )
                part = banded._banded_take(
                    "asm", all_vals[:ne_cells].T.reshape(-1)
                ).astype(dtype)
                if size != ndofs:
                    part = jnp.concatenate(
                        [part, jnp.zeros(size - ndofs, dtype)]
                    )
                return part
            return jnp.zeros(size, dtype).at[dofmap_l.ravel()].add(vals_e.ravel())

        if shard_dofs:
            def gather_full(v):
                return jax.lax.all_gather(v, axis, axis=0, tiled=True)

            def assemble(vals_e, dtype):
                return jax.lax.psum_scatter(
                    partial_assemble(vals_e, dtype, nd_p),
                    axis,
                    scatter_dimension=0,
                    tiled=True,
                )

            def vdot(a, b):
                return jax.lax.psum(jnp.vdot(a, b), axis)
        else:
            def gather_full(v):
                return v

            def assemble(vals_e, dtype):
                return jax.lax.psum(partial_assemble(vals_e, dtype, ndofs), axis)

            def vdot(a, b):
                return jnp.vdot(a, b)

        def norm(v):
            return jnp.sqrt(vdot(v, v))

        u = jnp.where(bc_mask, bc_vals, u)

        # --- frozen two-level coarse factor from the ENTERING tangent -----
        # (built from the SAME K_e the first Newton update uses — see the
        # build_coarse call after the initial evaluate below; no extra
        # tangent assembly)
        def build_coarse(K_e0):
            w_l = jnp.where(
                gather_full(bc_mask.astype(K_e0.dtype))[dofmap_l] > 0.5, 0.0, 1.0
            )
            Kw = K_e0 * w_l[:, :, None] * w_l[:, None, :]
            idx = (
                cdof_l[:, :, None] * ncoarse + cdof_l[:, None, :]
            ).ravel()
            Ac = jax.lax.psum(
                jnp.zeros(ncoarse * ncoarse, K_e0.dtype)
                .at[idx]
                .add(Kw.ravel()),
                axis,
            ).reshape(ncoarse, ncoarse)
            dAc = jnp.diagonal(Ac)
            ridge = 1e-8 * jnp.max(jnp.abs(dAc)) + 1e-30
            Ac = Ac + (
                ridge + jnp.where(jnp.abs(dAc) < ridge, 1.0, 0.0)
            ) * jnp.eye(ncoarse, dtype=K_e0.dtype)
            # dense INVERSE, not an LU factor: triangular solves are
            # sequential (~ms latency each on TPU); the coarse apply must be
            # one (ncoarse, ncoarse) matmul per CG iteration
            return jnp.linalg.inv(Ac)

        if two_level:
            def shard_back(full):
                if shard_dofs:
                    if nd_p != ndofs:
                        full = jnp.concatenate(
                            [full, jnp.zeros(nd_p - ndofs, full.dtype)]
                        )
                    loc = nd_p // ndev
                    return jax.lax.dynamic_slice_in_dim(
                        full, (shard_index() * loc).astype(jnp.int32), loc
                    )
                return full

            def make_coarse_correct(Ac_inv):
                def coarse_correct(r):
                    r0 = jnp.where(bc_mask, 0.0, r)
                    if shard_dofs:
                        # gather-free restriction: embed the local slice into
                        # a zero grid (dynamic_update_slice, memory-speed),
                        # box-reduce, then psum only the tiny (ncoarse,)
                        # vector — no full-vector collective
                        loc = nd_p // ndev
                        start = (shard_index() * loc).astype(jnp.int32)
                        emb = jax.lax.dynamic_update_slice(
                            jnp.zeros(nd_p, r.dtype), r0, (start,)
                        )
                        rc = jax.lax.psum(restrict_full(emb), axis)
                    else:
                        rc = restrict_full(r0)
                    wc = Ac_inv @ rc
                    corr = shard_back(prolong_full(wc))
                    return jnp.where(bc_mask, 0.0, corr)

                return coarse_correct
        else:
            def make_coarse_correct(_):
                return jnp.zeros_like

        def residual_norm(u_try):
            """Flux-only residual norm (line-search trials; no tangent work)."""
            u_e = gather_cells(gather_full(u_try))
            grads = jax.vmap(cell_eval)(u_e, dNdx_l, x_q_l)
            x_flat = grads.reshape(-1, grads.shape[-1])
            if fast_flux is not None:
                flux, _ = fast_flux(x_flat, state_l, dt)
            elif fast_update is not None:
                flux, _, _ = fast_update(x_flat, state_l, dt)
            else:
                flux, _ = jax.vmap(lambda xi, si: point_flux(xi, si, dt))(
                    x_flat, state_l
                )
            flux_e = flux.reshape(u_e.shape[0], nq, -1)

            def cell_r(ue, d, x, w, fl):
                def work(w_):
                    g = cell_eval(w_, d, x)
                    return jnp.sum(w[:, None] * g * fl)

                return jax.grad(work)(ue)

            r_e = jax.vmap(cell_r)(u_e, dNdx_l, x_q_l, wdetJ_l, flux_e)
            r = jnp.where(bc_mask, 0.0, assemble(r_e, u_try.dtype))
            return norm(r)

        def newton_update(u, R, K_e, res_norm):
            """One CG solve + backtracking line-search update."""
            if use_block_smoother:
                # NODE-BLOCK Jacobi: assemble the (ncomp, ncomp) diagonal
                # block of every node (couples the components the scalar
                # diagonal ignores — on vector elasticity, and especially
                # near-incompressible tangents, markedly better CG rates).
                # Column b of each node block rides the SAME scalar assembly
                # engine: element values v[e, j] = K_e[e, j, node(j)*ncomp+b]
                # assemble to D_b with D_b[node*ncomp + a] = B[node][a, b].
                jj = np.arange(ndof_el)
                node_col0 = jnp.asarray((jj // ncomp) * ncomp)
                cols = [
                    assemble(K_e[:, jj, node_col0 + b], u.dtype)
                    for b in range(ncomp)
                ]
                Bm = jnp.stack(cols, axis=-1).reshape(-1, ncomp, ncomp)
                # Dirichlet (and pad) rows/cols -> identity
                mb = bc_mask.reshape(-1, ncomp).astype(u.dtype)
                keep = 1.0 - mb
                Bm = Bm * keep[:, :, None] * keep[:, None, :]
                eye = jnp.eye(ncomp, dtype=u.dtype)
                Bm = Bm + eye * mb[:, :, None]
                # all-zero blocks (unreferenced dofs) -> identity ridge
                tr = jnp.einsum("naa->n", jnp.abs(Bm))
                Bm = Bm + eye * jnp.where(
                    tr < 1e-30, 1.0, 1e-14 * tr
                )[:, None, None]
                Binv = _sym_block_inv(Bm, eye)

                def smooth(r):
                    return jnp.einsum(
                        "nab,nb->na", Binv, r.reshape(-1, ncomp)
                    ).reshape(-1)

            else:
                diag = assemble(
                    jnp.diagonal(K_e, axis1=1, axis2=2), u.dtype
                )
                diag = jnp.where(
                    bc_mask | (jnp.abs(diag) < 1e-30), 1.0, diag
                )

                def smooth(r):
                    return r / diag

            def Av(v):
                v0 = jnp.where(bc_mask, 0.0, v)
                y_e = jnp.einsum(
                    "eij,ej->ei", K_e, gather_cells(gather_full(v0))
                )
                y = assemble(y_e, v.dtype)
                return jnp.where(bc_mask, v, y)

            b = jnp.where(bc_mask, 0.0, -R)
            x0 = jnp.zeros_like(b)
            r0 = b
            z0 = smooth(r0) + coarse_correct(r0)
            p0 = z0

            def cg_body(cg):
                x, r, z, p, rz, k = cg
                Ap = Av(p)
                denom = vdot(p, Ap)
                alpha = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0)
                x = x + alpha * p
                r = r - alpha * Ap
                z = smooth(r) + coarse_correct(r)
                rz_new = vdot(r, z)
                beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
                p = z + beta * p
                return (x, r, z, p, rz_new, k + 1)

            # early-exiting CG: n_cg is a BUDGET, not a fixed trip count —
            # iterations stop once the preconditioned residual norm-squared
            # drops below (cg_rtol^2)*initial (late Newton iterations whose
            # entering direction is already good then cost a handful of
            # matvecs instead of the full budget)
            rz0 = vdot(r0, z0)
            cg_tol2 = (cg_rtol * cg_rtol) * jnp.abs(rz0)

            def cg_cond(cg):
                *_, rz, k = cg
                return jnp.logical_and(k < n_cg, jnp.abs(rz) > cg_tol2)

            du, *_ = jax.lax.while_loop(
                cg_cond, cg_body, (x0, r0, z0, p0, rz0, 0)
            )

            # backtracking line search (Armijo on |R|) — while_loop
            def ls_cond(c):
                alpha, n_try, k = c
                bad = jnp.logical_or(
                    ~jnp.isfinite(n_try), n_try >= (1 - 1e-4 * alpha) * res_norm
                )
                return jnp.logical_and(bad, k < n_backtracks)

            def ls_body(c):
                alpha, _, k = c
                alpha = alpha * 0.5
                return (alpha, residual_norm(u + alpha * du), k + 1)

            n1 = residual_norm(u + du)
            alpha, n_fin, _ = jax.lax.while_loop(ls_cond, ls_body, (1.0, n1, 0))
            # if even the smallest step is worse, keep u (stagnation guard)
            take = jnp.isfinite(n_fin) & (n_fin < res_norm)
            return jnp.where(take, u + alpha * du, u)

        def evaluate(u_):
            r_e, K_e, st = local_kernels(
                gather_cells(gather_full(u_)), dNdx_l, wdetJ_l, x_q_l,
                state_l, dt,
            )
            R = jnp.where(bc_mask, 0.0, assemble(r_e, u_.dtype))
            return R, K_e, st

        # ONE evaluation at the entering u feeds the coarse setup, the first
        # Newton update, AND the already-converged exit: the carry holds
        # (R, K_e, state) so nothing is assembled twice per iteration and no
        # extra exit evaluation is needed (state always matches u)
        R, K_e, st_out = evaluate(u)
        res = norm(R)
        res0 = jnp.maximum(res, 1e-30)
        coarse_correct = make_coarse_correct(
            build_coarse(K_e) if two_level else None
        )

        def newton_body(carry):
            u, R, K_e, st, res, it = carry
            u_new = newton_update(u, R, K_e, res)
            R_new, K_new, st_new = evaluate(u_new)
            return (u_new, R_new, K_new, st_new, norm(R_new), it + 1)

        def newton_cond(carry):
            _, _, _, _, res_prev, it = carry
            return jnp.logical_and(
                it < n_newton, res_prev > rtol * res0 + atol
            )

        u, R, K_e, st_out, res_norm, _ = jax.lax.while_loop(
            newton_cond, newton_body, (u, R, K_e, st_out, res, 0)
        )
        return u, st_out, res_norm

    npoints_real = ne_real * nq

    def unpad_state(state):
        """Trim padding Gauss points (cells padded to a mesh-size multiple point
        at dof 0 and integrate garbage strains) so callers can commit the
        returned state into a real DataManager safely."""
        return jax.tree.map(lambda a: a[:npoints_real], state)

    def step(u, internal_state, bc_mask, bc_vals, dt=0.0):
        state_p = pad_state(internal_state)
        u = jnp.asarray(u)
        bc_mask = jnp.asarray(bc_mask)
        bc_vals = jnp.asarray(bc_vals, u.dtype)
        if shard_dofs and nd_p != ndofs:
            # padded dofs are pinned to 0 like Dirichlet rows
            u = jnp.concatenate([u, jnp.zeros(nd_p - ndofs, u.dtype)])
            bc_mask = jnp.concatenate(
                [bc_mask, jnp.ones(nd_p - ndofs, bc_mask.dtype)]
            )
            bc_vals = jnp.concatenate(
                [bc_vals, jnp.zeros(nd_p - ndofs, bc_vals.dtype)]
            )
        u_new, new_state, res_norm = _step(
            u, *tables, state_p, bc_mask, bc_vals, dt,
        )
        return u_new[:ndofs], unpad_state(new_state), res_norm

    step.tables = tables
    step.ne_real = ne_real
    step.pad_state = pad_state
    step.unpad_state = unpad_state
    return jax.jit(step, static_argnames=()), pad_state


def make_sharded_newton_step_general(
    problem,
    mesh: Mesh,
    axis="cells",
    n_newton=10,
    n_cg=100,
    n_backtracks=10,
    rtol=None,
    atol=0.0,
    shard_dofs=False,
    cg_rtol=1e-8,
    use_banded=True,
    pc="two_level",
    pc_boxes=8,
    smoother=None,
    precision="same",
    coarse_modes="trans",
    agg_split_materials=False,
    return_info=False,
    f32_warmup=True,
):
    """Fully-fused sharded Newton step for GENERAL problems (VERDICT r2 item 3).

    Where :func:`make_sharded_newton_step` hard-codes the single-material
    flux.dgrad mechanics signature, this builder closes over a
    ``NonlinearMaterialProblem``'s full term structure and supports:

    - MULTIPLE gradients and expression-valued external state variables
      (thermal problems: TemperatureGradient + Temperature ESV);
    - arbitrary residual terms ``sum_k scale_k * \\int field_k . expr_k(du)``
      where field_k is a flux OR an internal state variable (the transient
      enthalpy theta-scheme), with per-call traced scales;
    - every declared tangent block (flux x gradient, ISV x gradient/ESV)
      sliced from the material's packed forward-mode Jacobian;
    - constant material-frame ROTATIONS (global->material (3,3), the
      reference's MGIS rotation path, mfront.py:336-343);
    - MULTI-MATERIAL cell subsets: one qmap per subset, each subset's cells
      padded and sharded over the same mesh axis, contributions partial-
      assembled per device and psum'd once;
    - unstructured (gmsh) meshes. Per-qmap gathers/assembly route through
      the banded lane-gather engine whenever the (sub)domain's plans built
      (``QuadratureDomain._banded`` — the same redundant-full pattern as the
      specialized step: every device runs the full banded pass at memory
      speed, per-element work stays sharded); otherwise scalar dofmap
      gathers. ``use_banded=False`` forces the dofmap path.

    Returns ``step(u, states, bc_mask, bc_vals, dt=0.0, scales=None,
    f_ext=None) -> (u_new, new_states, res_norm)`` with ``states`` a list of
    per-qmap internal-state pytrees (padded via the returned ``pad_states``)
    and ``scales`` a list (per qmap) of lists of term scales.

    With ``shard_dofs=True`` the dof vectors (u, R, CG workspace, bc arrays,
    f_ext) are SHARDED over the mesh axis (the same all_gather /
    psum_scatter sequence-parallel pattern as the flagship step — per-device
    persistent dof memory O(ndofs / n_devices)); default False keeps them
    replicated.

    Preconditioning matches the specialized step: ``pc="two_level"``
    (default) adds the FROZEN coordinate-box-aggregate coarse correction —
    mesh-agnostic, with the coarse operator accumulated over ALL qmaps'
    entering tangents — and vector problems default to the node-BLOCK
    Jacobi smoother (``smoother="jacobi"`` opts out, ``pc="jacobi"`` drops
    the coarse correction).

    High-contrast / high-accuracy extensions (VERDICT r3 items 1-2):

    - ``coarse_modes="rbm"``: per-aggregate RIGID-BODY coarse modes
      (translations + rotations, the GAMG near-nullspace) instead of
      piecewise constants — the robust coarse space for near-incompressible
      tangents and quasi-rigid inclusions (:func:`_coord_agg_modes`);
    - ``coarse_modes="p1"``: the geometric P2->P1 VERTEX coarse space on
      simplex meshes (:func:`_p1_coarse`) — a CONTINUOUS coarse basis with
      the geometric-multigrid energy bound, measured ~3x fewer PCG
      iterations than box-RBM on the tet-P2 Ogden tangent (docs/perf.md);
      requires a P2 triangle/tet space;
    - ``agg_split_materials=True``: aggregates never mix nodes of different
      qmap subsets, so each stiff inclusion gets its own rigid modes (nodes
      on subset interfaces count as the LAST qmap touching them — list
      inclusions after the matrix);
    - ``precision="mixed"``: the accuracy-critical path (u, constitutive
      update, residual assembly, line-search norms) runs in FLOAT64 while
      the tangent matrices and the CG solve stay float32 with an explicit
      SYMMETRIC DIAGONAL SCALING (all CG vectors O(1), so the f32
      recurrences survive the composite benchmark's 1e12 stiffness
      contrast). This is iterative-refinement-flavored inexact Newton: each
      f32-solved correction is applied to the f64 iterate and the TRUE f64
      residual re-measured, so the achievable per-step relative residual is
      set by f64, not by the f32 assembly floor (~60 Pa/GP measured on the
      Ogden protocol, docs/perf.md). Requires ``jax_enable_x64``. The f64
      residual path uses dofmap gathers + f64 scatter-adds (the Pallas
      banded engine is f32; CG matvecs still ride it). With ``f32_warmup``
      (default) each mixed step first runs Newton on an ALL-f32 copy of the
      problem — banded gathers, MXU einsums, ~10x cheaper per iteration
      than emulated-f64 — down to the f32 floor, then the f64 loop
      polishes (typically 1-2 iterations). The returned ``res0`` is the
      step's true entering residual as measured by the warmup.

    With ``return_info=True`` the step returns ``(u, states, res_norm,
    res0)`` — the entering residual norm alongside the final one, so callers
    can record per-step RELATIVE residuals without an extra dispatch.
    ``return_info="stats"`` appends ``(newton_its, cg_its_total)`` — the
    while_loop trip counts, already in the carries, so the telemetry is
    free — for profiling where a load step's time goes.
    """
    import numpy as _np

    from ..fem.forms import Ctx

    axis = tuple(axis) if isinstance(axis, (tuple, list)) else axis
    ndev = _axis_size(mesh, axis)
    space = problem.u.space
    ndofs = space.num_dofs
    ncomp_sp = space.ncomp
    # pad so a node's dof block never straddles a shard boundary (block
    # smoother) — see the specialized builder
    nd_p = ndofs + ((-ndofs) % (ndev * ncomp_sp)) if shard_dofs else ndofs
    if smoother not in (None, "jacobi", "block"):
        raise ValueError(
            f"smoother must be None, 'jacobi' or 'block', got {smoother!r}"
        )
    # default: block only on 3D vector spaces (see the specialized step's
    # measured 2D cost/benefit note)
    use_block_smoother = (
        smoother or ("block" if ncomp_sp >= 3 else "jacobi")
    ) == "block" and ncomp_sp > 1
    if precision not in ("same", "mixed"):
        raise ValueError(f"precision must be 'same' or 'mixed', got {precision!r}")
    mixed = precision == "mixed"
    if mixed:
        if not jax.config.jax_enable_x64:
            raise RuntimeError(
                "precision='mixed' needs jax_enable_x64 (the f64 residual path)"
            )
        f_hi, f_lo = jnp.float64, jnp.float32
    nnodes = ndofs // ncomp_sp
    two_level = pc == "two_level"
    p1_coarse = two_level and coarse_modes == "p1"
    if p1_coarse:
        # geometric P2->P1 coarse space (continuous basis; agg_split has no
        # meaning here — vertex hat functions already localize per material)
        ncoarse, p1_parents, p1_pw, p1_vid, p1_W = _p1_coarse(space)
        nverts_c = ncoarse // ncomp_sp
        p1_parents_j = jnp.asarray(p1_parents)
        p1_pw_j = jnp.asarray(p1_pw)
    elif two_level:
        labels = None
        if agg_split_materials and len(problem._terms) > 1:
            # node label = LAST qmap whose cells touch the node (list stiff
            # inclusions after the matrix so interface nodes join them)
            labels = _np.zeros(nnodes, _np.int64)
            for i, t in enumerate(problem._terms):
                nds = _np.unique(
                    _np.asarray(t["qmap"].domain.dofmap) // ncomp_sp
                )
                labels[nds] = i
        ncoarse, agg_of_node, W_node = _coord_agg_modes(
            space, pc_boxes, modes=coarse_modes, labels=labels
        )
        nmodes = W_node.shape[2]
        agg_ids_node = jnp.asarray(agg_of_node)
        W_node_j = jnp.asarray(W_node)
    else:
        ncoarse = 1
    if rtol is None:
        rtol = 1e-10 if (
            mixed or float(jnp.finfo(jnp.zeros(0).dtype).eps) < 1e-9
        ) else 1e-6

    # ---- per-qmap static structure --------------------------------------
    qinfos = []
    for t in problem._terms:
        qmap = t["qmap"]
        dom = qmap.domain
        material = qmap.material
        dNdx, ne_real = pad_to_multiple(_np.asarray(dom.dNdx), ndev)
        wdetJ, _ = pad_to_multiple(_np.asarray(dom.wdetJ), ndev)
        x_q, _ = pad_to_multiple(_np.asarray(dom.x_q), ndev)
        dofmap, _ = pad_to_multiple(_np.asarray(dom.dofmap), ndev)
        init_tpl = material.behavior.init_state()

        # tangent structure: (term k, input expr, block key) with block slices
        tstruct = []
        for (k, by, bx) in t["block_keys"]:
            x_expr = qmap.gradient_exprs.get(bx) or qmap.esv_exprs.get(bx)
            sl, sy, sx = qmap._block_slices[(by, bx)]
            tstruct.append((k, x_expr, sl, sy, sx))

        # field extraction: term field is a flux (slice of flux_flat) or ISV
        from ..state import _slices as _mk_slices

        flux_slices = _mk_slices(material.fluxes)
        field_getters = []
        for name in t["field_names"]:
            if name in flux_slices:
                field_getters.append(("flux", flux_slices[name]))
            else:
                field_getters.append(("isv", name))

        # differentiable inputs: gradients then ESVs (Material._in_slices
        # order); expression-valued ESVs evaluated per point, constant ESVs
        # passed as sharded arrays
        grad_exprs = [qmap.gradient_exprs[g] for g in material.gradient_names]
        esv_entries = []  # (name, size, "expr"/"const")
        for name, size in material.external_state_variables.items():
            kind = "expr" if name in qmap.esv_exprs else "const"
            esv_entries.append((name, size, kind))
        esv_exprs = {n: qmap.esv_exprs[n] for n, _, k in esv_entries if k == "expr"}

        if material.rotation_matrix is not None:
            R = _np.asarray(material.rotation_matrix)
            if R.shape != (3, 3):
                # a raise, not an assert: per-point (n,3,3) rotations are a
                # supported HOST-path feature (material.py), so under
                # ``python -O`` a stripped assert would let them through to an
                # opaque einsum shape error inside shard_map
                raise NotImplementedError(
                    "fused general step supports constant (3,3) rotations; "
                    f"got rotation_matrix of shape {R.shape}"
                )

        qinfos.append(
            dict(
                qmap=qmap,
                material=material,
                dom=dom,
                ne_real=ne_real,
                ne_pad=dNdx.shape[0],
                ne_cells=_np.asarray(dom.dofmap).shape[0],
                ndof_el=_np.asarray(dom.dofmap).shape[1],
                banded=(
                    dom
                    if (use_banded and getattr(dom, "_banded", None))
                    else None
                ),
                # coarse tables (pads -> dof 0 -> node 0: zero K_e rows,
                # harmless): per-element node aggregates + mode weights, or
                # for p1 the element VERTEX ids (first nvloc local nodes are
                # the vertices in the canonical local ordering; padded rows
                # clamp to vertex 0 under their zero K_e rows)
                cdof=(
                    (
                        jnp.asarray(
                            _np.maximum(
                                p1_vid[
                                    _np.asarray(dofmap)[
                                        :, : space.mesh.cells.shape[1]
                                        * dom.ncomp : dom.ncomp
                                    ]
                                    // ncomp_sp
                                ],
                                0,
                            ).astype(_np.int32)
                        ),
                    )
                    if p1_coarse
                    else (
                        jnp.asarray(
                            agg_of_node[
                                _np.asarray(dofmap)[:, ::dom.ncomp]
                                // ncomp_sp
                            ].astype(_np.int32)
                        ),
                        jnp.asarray(
                            W_node[
                                _np.asarray(dofmap)[:, ::dom.ncomp]
                                // ncomp_sp
                            ]
                        ),
                    )
                    if two_level
                    else (
                        jnp.zeros(
                            (dofmap.shape[0], dom.nloc), jnp.int32
                        ),
                        jnp.zeros(
                            (dofmap.shape[0], dom.nloc, dom.ncomp, 1),
                            jnp.float32,
                        ),
                    )
                ),
                tables=(
                    jnp.asarray(dNdx),
                    jnp.asarray(wdetJ),
                    jnp.asarray(x_q),
                    jnp.asarray(dofmap),
                ),
                init_tpl=init_tpl,
                exprs=t["exprs"],
                nterms=len(t["exprs"]),
                tstruct=tstruct,
                field_getters=field_getters,
                grad_exprs=grad_exprs,
                esv_entries=esv_entries,
                esv_exprs=esv_exprs,
                nq=dom.nq,
                nloc=dom.nloc,
                ncomp=dom.ncomp,
                N_tab=dom.N,
            )
        )

    def pad_states(states):
        out = []
        for qi, st in zip(qinfos, states):
            npts = qi["ne_pad"] * qi["nq"]

            def pad_leaf(a, tpl):
                a = jnp.asarray(a)
                pad = npts - a.shape[0]
                if pad == 0:
                    return a
                fill = jnp.broadcast_to(
                    jnp.asarray(tpl, a.dtype), (pad,) + a.shape[1:]
                )
                return jnp.concatenate([a, fill])

            out.append(jax.tree.map(pad_leaf, st, qi["init_tpl"]))
        return out

    # ---- per-qmap local kernels (shard-local tables) --------------------
    def make_local(qi):
        material = qi["material"]
        nloc, ncomp, nq = qi["nloc"], qi["ncomp"], qi["nq"]
        N_tab = qi["N_tab"]
        grad_exprs, esv_entries = qi["grad_exprs"], qi["esv_entries"]
        esv_exprs = qi["esv_exprs"]
        exprs, tstruct = qi["exprs"], qi["tstruct"]
        field_getters = qi["field_getters"]
        in_slices = material._in_slices
        point_update = material._point_update
        point_flux = material._point_flux
        fast_update = material._fast_update
        fast_flux = material._fast_flux
        has_esv = bool(esv_entries)
        has_props = bool(getattr(material.behavior, "material_properties", {}))
        # integrate_local/flux_local drop props_l on the fast paths — safe
        # ONLY because Material._build_batched disables the fast path when
        # material_properties are declared (material.py). Guard that
        # cross-file invariant here at kernel-build time so a future
        # props-aware batched_update can't silently run without properties.
        if has_props and (fast_update is not None or fast_flux is not None):
            raise NotImplementedError(
                "behavior declares material_properties but also a whole-batch "
                "fast path; the fused step's fast path ignores properties "
                "(Material._build_batched is expected to gate this)"
            )

        def cell_eval(expr, ue, d, x):
            un = ue.reshape(nloc, ncomp)
            u_q = N_tab @ un
            g_q = jnp.einsum("qvi,vc->qci", d, un)
            return jax.vmap(lambda u_, g_, x_: expr(Ctx(u_, g_, x_)))(u_q, g_q, x)

        def point_inputs(u_e, dNdx_l, x_q_l, esv_const):
            """Per-shard (npts_l, n_inputs) differentiable input batch."""
            parts = []
            for expr in grad_exprs:
                g = jax.vmap(lambda ue, d, x: cell_eval(expr, ue, d, x))(
                    u_e, dNdx_l, x_q_l
                )
                parts.append(g.reshape(g.shape[0] * nq, -1))
            for name, size, kind in esv_entries:
                if kind == "expr":
                    g = jax.vmap(
                        lambda ue, d, x: cell_eval(esv_exprs[name], ue, d, x)
                    )(u_e, dNdx_l, x_q_l)
                    parts.append(g.reshape(g.shape[0] * nq, -1))
                else:
                    parts.append(esv_const[name])
            return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

        def apply_rot(x, slices, sizes, transpose, n):
            if material.rotation_matrix is None:
                return x
            ops = material._rotation_ops(n, x.dtype)
            return material._rotate_cols(x, slices, sizes, ops, transpose)

        from ..state import _slices as _mk_slices

        def integrate_local(x, state_l, props_l, dt):
            n = x.shape[0]
            x = apply_rot(x, in_slices, material._input_sizes, False, n)
            if fast_update is not None:
                flux, Ct, new_state = fast_update(x, state_l, dt)
                Ct = Ct.reshape(n, -1)
            else:
                flux, Ct, new_state = jax.vmap(
                    lambda xi, pi, si: point_update(xi, pi, si, dt)
                )(x, props_l, state_l)
            if material.rotation_matrix is not None:
                ops = material._rotation_ops(n, x.dtype)
                flux = material._rotate_cols(
                    flux, _mk_slices(material.fluxes), material.fluxes, ops, True
                )
                Ct = material._rotate_tangent(Ct, ops)
            return flux, Ct, new_state

        def flux_local(x, state_l, props_l, dt):
            n = x.shape[0]
            x = apply_rot(x, in_slices, material._input_sizes, False, n)
            if fast_flux is not None:
                flux, new_state = fast_flux(x, state_l, dt)
            elif fast_update is not None:
                flux, _, new_state = fast_update(x, state_l, dt)
            else:
                flux, new_state = jax.vmap(
                    lambda xi, pi, si: point_flux(xi, pi, si, dt)
                )(x, props_l, state_l)
            if material.rotation_matrix is not None:
                ops = material._rotation_ops(n, x.dtype)
                flux = material._rotate_cols(
                    flux, _mk_slices(material.fluxes), material.fluxes, ops, True
                )
            return flux, new_state

        def fields_from(flux, new_state, ne_l):
            out = []
            for kind, key in field_getters:
                if kind == "flux":
                    f = flux[:, key]
                else:
                    f = jnp.reshape(new_state[key], (flux.shape[0], -1))
                out.append(f.reshape(ne_l, nq, -1))
            return out

        def residual_cells(u_e, dNdx_l, wdetJ_l, x_q_l, fields_e, scales):
            def cell_r(ue, d, x, w, flds):
                def work(w_):
                    tot = 0.0
                    for sc, expr, fl in zip(scales, exprs, flds):
                        g = cell_eval(expr, w_, d, x)
                        tot = tot + sc * jnp.sum(w[:, None] * g * fl)
                    return tot

                return jax.grad(work)(ue)

            return jax.vmap(cell_r)(u_e, dNdx_l, x_q_l, wdetJ_l, fields_e)

        def matrices_cells(u_e, dNdx_l, wdetJ_l, x_q_l, fields_e, Ct, scales):
            ne_l = u_e.shape[0]
            Cs = [
                (Ct[:, sl].reshape(ne_l, nq, sy, sx), k)
                for (k, _, sl, sy, sx) in tstruct
            ]

            def cell_K(ue, d, x, w, flds, *Cblocks):
                Bcache = {}

                def B_of(expr):
                    key = id(expr)
                    if key not in Bcache:
                        Bcache[key] = jax.jacfwd(
                            lambda w_: cell_eval(expr, w_, d, x)
                        )(ue)
                    return Bcache[key]

                ndof_el = nloc * ncomp
                K = jnp.zeros((ndof_el, ndof_el), ue.dtype)
                for (kterm, x_expr, sl, sy, sx), C in zip(tstruct, Cblocks):
                    By = B_of(exprs[kterm])
                    Bx = B_of(x_expr)
                    K = K + scales[kterm] * jnp.einsum(
                        "qai,qab,qbj,q->ij", By, C, Bx, w
                    )

                def work(w_):
                    tot = 0.0
                    for sc, expr, fl in zip(scales, exprs, flds):
                        g = cell_eval(expr, w_, d, x)
                        tot = tot + sc * jnp.sum(w[:, None] * g * fl)
                    return tot

                return K + jax.hessian(work)(ue)

            return jax.vmap(cell_K)(
                u_e, dNdx_l, x_q_l, wdetJ_l, fields_e, *[c for c, _ in Cs]
            )

        return dict(
            point_inputs=point_inputs,
            integrate=integrate_local,
            flux=flux_local,
            fields_from=fields_from,
            residual_cells=residual_cells,
            matrices_cells=matrices_cells,
            has_props=has_props,
        )

    locals_ = [make_local(qi) for qi in qinfos]
    nmats = len(qinfos)

    # ---- sharded constant per-point data (ESV consts, props) ------------
    def shard_consts():
        esv_c, props_c = [], []
        for qi in qinfos:
            material = qi["material"]
            npts = qi["ne_pad"] * qi["nq"]
            npts_real = qi["ne_real"] * qi["nq"]
            d = {}
            for name, size, kind in qi["esv_entries"]:
                if kind != "const":
                    continue
                v = material.external_state.get(name)
                arr = (
                    material._to_batched(v, npts_real, size)
                    if v is not None
                    else jnp.zeros((npts_real, size))
                )
                # pad with the LAST real value, not zeros: a zeroed ESV
                # (e.g. Temperature) can push padded points into unphysical
                # regimes that NaN before the zero weight masks them
                d[name] = jnp.concatenate(
                    [
                        arr,
                        jnp.broadcast_to(
                            arr[-1:], (npts - npts_real, size)
                        ),
                    ]
                )
            esv_c.append(d)
            p = {}
            declared = getattr(material.behavior, "material_properties", {})
            for name, size in declared.items():
                v = material.material_property_values.get(name)
                if v is None:
                    raise ValueError(f"material property '{name}' not set")
                arr = material._to_batched(v, npts_real, size)
                arr = jnp.concatenate(
                    [arr, jnp.broadcast_to(arr[-1:], (npts - npts_real, size))]
                )
                p[name] = arr[:, 0] if size == 1 else arr
            props_c.append(p)
        return esv_c, props_c

    esv_consts, props_consts = shard_consts()

    P_ax, P_rep = P(axis), P()
    u_spec = P_ax if shard_dofs else P_rep
    table_specs = tuple((P_ax,) * 4 for _ in qinfos)
    cdof_specs = tuple(
        tuple(P_ax for _ in qi["cdof"]) for qi in qinfos
    )
    state_specs = tuple(P_ax for _ in qinfos)
    esv_specs = tuple(jax.tree.map(lambda _: P_ax, d) for d in esv_consts)
    prop_specs = tuple(jax.tree.map(lambda _: P_ax, d) for d in props_consts)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            u_spec,  # u
            table_specs,
            cdof_specs,
            state_specs,
            esv_specs,
            prop_specs,
            u_spec,  # bc_mask
            u_spec,  # bc_vals
            P_rep,  # dt
            P_rep,  # scales (flat tuple)
            u_spec,  # f_ext
        ),
        out_specs=(
            u_spec, tuple(P_ax for _ in qinfos), P_rep, P_rep, P_rep, P_rep,
        ),
        # pallas_call (banded engine) inside shard_map cannot annotate its
        # outputs' varying-across-mesh state; skip the check (collectives
        # here are explicit psums/all_gathers, validated by equivalence
        # tests) — same as the specialized step
        check_vma=False,
    )
    def _step(u, tables, cdofs, states, esv_c, props_c, bc_mask, bc_vals, dt,
              scales_flat, f_ext):
        # --- dof-layout helpers (VERDICT r3 roadmap: dof sharding for the
        # GENERAL step, same sequence-parallel pattern as the flagship) ----
        if shard_dofs:
            def gather_full(v):
                return jax.lax.all_gather(v, axis, axis=0, tiled=True)

            def reduce_assembled(part):
                return jax.lax.psum_scatter(
                    part, axis, scatter_dimension=0, tiled=True
                )

            def vdot(a, b):
                return jax.lax.psum(jnp.vdot(a, b), axis)
        else:
            def gather_full(v):
                return v

            def reduce_assembled(part):
                return jax.lax.psum(part, axis)

            def vdot(a, b):
                return jnp.vdot(a, b)

        def norm(v):
            return jnp.sqrt(vdot(v, v))

        # unflatten per-qmap scales
        scales = []
        pos = 0
        for qi in qinfos:
            scales.append(scales_flat[pos : pos + qi["nterms"]])
            pos += qi["nterms"]

        u = jnp.where(bc_mask, bc_vals, u)

        def shard_index():
            if isinstance(axis, tuple):
                s = jax.lax.axis_index(axis[0])
                for a in axis[1:]:
                    s = s * mesh.shape[a] + jax.lax.axis_index(a)
                return s
            return jax.lax.axis_index(axis)

        # --- per-qmap gather/assembly: banded lane-gather engine when the
        # (sub)domain's plans built, scalar dofmap gather/scatter otherwise
        # (the specialized step's redundant-full pattern — every device runs
        # the full banded pass, element work stays sharded) ----------------
        def make_dof_ops(qi):
            banded = qi["banded"]
            if banded is None:
                return None
            ne_pad, ne_cells = qi["ne_pad"], qi["ne_cells"]
            ndof_el = qi["ndof_el"]
            ne_local = ne_pad // ndev

            def gather_cells(u_full):
                ue = banded._banded_take("cell", u_full[:ndofs]).reshape(
                    ne_cells, ndof_el
                )
                if ne_pad != ne_cells:
                    ue = jnp.concatenate(
                        [ue, jnp.zeros((ne_pad - ne_cells, ndof_el), ue.dtype)]
                    )
                return jax.lax.dynamic_slice_in_dim(
                    ue, (shard_index() * ne_local).astype(jnp.int32), ne_local
                )

            def partial_assemble(vals_e, dtype):
                all_vals = jax.lax.dynamic_update_slice(
                    jnp.zeros((ne_pad, ndof_el), dtype),
                    vals_e.astype(dtype),
                    (
                        (shard_index() * ne_local).astype(jnp.int32),
                        jnp.int32(0),
                    ),
                )
                part = banded._banded_take(
                    "asm", all_vals[:ne_cells].T.reshape(-1)
                ).astype(dtype)
                if nd_p != ndofs:
                    part = jnp.concatenate(
                        [part, jnp.zeros(nd_p - ndofs, dtype)]
                    )
                return part

            return (gather_cells, partial_assemble)

        dof_ops = [make_dof_ops(qi) for qi in qinfos]

        def gather_e(i, u_full, dofmap_l):
            ops = dof_ops[i]
            # f64 vectors (the mixed-precision residual path) take the dofmap
            # gather: the banded engine is a Pallas f32 kernel
            if ops is None or u_full.dtype == jnp.float64:
                return u_full[dofmap_l]
            return ops[0](u_full)

        def assemble(i, dofmap_l, vals_e, dtype):
            ops = dof_ops[i]
            if ops is None or dtype == jnp.float64:
                return jnp.zeros(nd_p, dtype).at[dofmap_l.ravel()].add(
                    vals_e.ravel()
                )
            return ops[1](vals_e, dtype)
            # reduce_assembled by the caller once over all qmaps

        # --- frozen coordinate-box two-level coarse correction (same scheme
        # as the specialized step; the coarse operator accumulates EVERY
        # qmap's entering tangent) ------------------------------------------
        def build_coarse(K_es):
            """Ac = W^T K W over node aggregates x modes (or the P2->P1
            vertex interpolation), accumulated over all qmaps: per element a
            node-level einsum (MXU work) then one small-footprint scatter —
            once per load step."""
            dtype = K_es[0].dtype
            bcw = gather_full(bc_mask.astype(dtype))
            Ac = jnp.zeros(ncoarse * ncoarse, dtype)
            if p1_coarse:
                Wp1_j = jnp.asarray(p1_W)
                crange = jnp.arange(ncomp_sp, dtype=jnp.int32)[None, None, :]
            else:
                mrange = jnp.arange(nmodes, dtype=jnp.int32)[None, None, :]
            for qi, tbl, cd, K_e in zip(
                qinfos, tables, cdofs, K_es
            ):
                dofmap_l = tbl[3]
                w_l = jnp.where(bcw[dofmap_l] > 0.5, 0.0, 1.0)
                Kw = K_e * w_l[:, :, None] * w_l[:, None, :]
                nl, nc = qi["nloc"], qi["ncomp"]
                Kn = Kw.reshape(Kw.shape[0], nl, nc, nl, nc)
                if p1_coarse:
                    (vert_l,) = cd
                    Wc = Wp1_j.astype(dtype)
                    # C_e[e, x, c, y, d] = Wp1[a, x] K[e,a,c,b,d] Wp1[b, y]
                    C_e = jnp.einsum("ax,eacbd,by->excyd", Wc, Kn, Wc)
                    ci = vert_l[:, :, None] * nc + crange  # (ne, nvloc, nc)
                else:
                    agg_l, W_l = cd
                    Wc = W_l.astype(dtype)
                    C_e = jnp.einsum("eacm,eacbd,ebdn->eambn", Wc, Kn, Wc)
                    ci = agg_l[:, :, None] * nmodes + mrange
                ne_l, nf = ci.shape[0], ci.shape[1] * ci.shape[2]
                cif = ci.reshape(ne_l, nf)
                idx = (
                    cif[:, :, None] * ncoarse + cif[:, None, :]
                ).ravel()
                Ac = Ac.at[idx].add(C_e.reshape(ne_l, nf, nf).ravel())
            Ac = jax.lax.psum(Ac, axis).reshape(ncoarse, ncoarse)
            dAc = jnp.diagonal(Ac)
            ridge = 1e-8 * jnp.max(jnp.abs(dAc)) + 1e-30
            Ac = Ac + (
                ridge + jnp.where(jnp.abs(dAc) < ridge, 1.0, 0.0)
            ) * jnp.eye(ncoarse, dtype=dtype)
            # scale-invariant inverse: symmetric diagonal scaling compresses
            # the contrast (inclusion-aggregate rows ~1e12, matrix ~1e7) so
            # the f32 dense inverse stays accurate; symmetrize both ways
            sc = 1.0 / jnp.sqrt(jnp.abs(dAc) + ridge)
            As = Ac * sc[:, None] * sc[None, :]
            As = 0.5 * (As + As.T)
            Ai = jnp.linalg.inv(As)
            Ai = 0.5 * (Ai + Ai.T)
            return Ai * sc[:, None] * sc[None, :]

        if p1_coarse:
            def restrict_full(r_full):
                rn = r_full[:ndofs].reshape(nnodes, ncomp_sp)
                pw = p1_pw_j.astype(rn.dtype)
                c0 = jax.ops.segment_sum(
                    rn * pw[:, :1], p1_parents_j[:, 0], num_segments=nverts_c
                )
                c1 = jax.ops.segment_sum(
                    rn * pw[:, 1:], p1_parents_j[:, 1], num_segments=nverts_c
                )
                return (c0 + c1).ravel()

            def prolong_full(wc):
                wn = wc.reshape(nverts_c, ncomp_sp)
                pw = p1_pw_j.astype(wc.dtype)
                return (
                    pw[:, :1] * wn[p1_parents_j[:, 0]]
                    + pw[:, 1:] * wn[p1_parents_j[:, 1]]
                ).ravel()
        elif two_level:
            def restrict_full(r_full):
                rn = r_full[:ndofs].reshape(nnodes, ncomp_sp)
                rm = jnp.einsum("nc,ncm->nm", rn, W_node_j.astype(rn.dtype))
                return jax.ops.segment_sum(
                    rm, agg_ids_node, num_segments=ncoarse // nmodes
                ).ravel()

            def prolong_full(wc):
                wcn = wc.reshape(-1, nmodes)[agg_ids_node]  # (nnodes, nmodes)
                return jnp.einsum(
                    "ncm,nm->nc", W_node_j.astype(wc.dtype), wcn
                ).ravel()

        if two_level:
            def shard_back(full):
                if shard_dofs:
                    if nd_p != ndofs:
                        full = jnp.concatenate(
                            [full, jnp.zeros(nd_p - ndofs, full.dtype)]
                        )
                    loc = nd_p // ndev
                    return jax.lax.dynamic_slice_in_dim(
                        full, (shard_index() * loc).astype(jnp.int32), loc
                    )
                return full

            def make_coarse_correct(Ac_inv):
                def coarse_correct(r, s_inv=None):
                    """Coarse correction; under explicit symmetric scaling
                    (``s_inv`` = 1/s) the coarse basis in scaled variables is
                    S^-1 W, so Ac stays the UNSCALED W^T K W while restrict/
                    prolong pick up one s_inv each."""
                    r0 = jnp.where(bc_mask, 0.0, r)
                    if s_inv is not None:
                        r0 = r0 * s_inv
                    if shard_dofs:
                        loc = nd_p // ndev
                        start = (shard_index() * loc).astype(jnp.int32)
                        emb = jax.lax.dynamic_update_slice(
                            jnp.zeros(nd_p, r.dtype), r0, (start,)
                        )
                        rc = jax.lax.psum(restrict_full(emb), axis)
                    else:
                        rc = restrict_full(r0)
                    wc = Ac_inv @ rc
                    corr = shard_back(prolong_full(wc))
                    if s_inv is not None:
                        corr = corr * s_inv
                    return jnp.where(bc_mask, 0.0, corr)

                return coarse_correct
        else:
            def make_coarse_correct(_):
                def coarse_correct(r, s_inv=None):
                    return jnp.zeros_like(r)

                return coarse_correct

        def evaluate_g(u_, tbls, sts, ecs, pcs, scs, f_ext_v, cast_K):
            """Full update: residual + element matrices + states, all qmaps.

            Under ``precision="mixed"`` the f64 call (``cast_K=True``) runs
            the constitutive update and element residual in f64 (exact
            geometry tables, dofmap gathers, f64 scatter-add assembly) while
            the element TANGENT matrices are computed in f32 from cast
            inputs — K only steers the CG, the f64 residual is what Newton
            converges on. The f32-warmup phase calls this with all-f32 data
            (``cast_K=False``): everything rides the banded engine."""
            u_full = gather_full(u_)
            R_part = jnp.zeros(nd_p, u_.dtype)
            K_es, new_states = [], []
            for i, (qi, lk, (dNdx_l, wdetJ_l, x_q_l, dofmap_l), st_l, ec, pc,
                    sc) in enumerate(zip(
                qinfos, locals_, tbls, sts, ecs, pcs, scs
            )):
                u_e = gather_e(i, u_full, dofmap_l)
                x = lk["point_inputs"](u_e, dNdx_l, x_q_l, ec)
                flux, Ct, st_new = lk["integrate"](x, st_l, pc, dt)
                fields_e = lk["fields_from"](flux, st_new, u_e.shape[0])
                r_e = lk["residual_cells"](u_e, dNdx_l, wdetJ_l, x_q_l, fields_e, sc)
                if cast_K:
                    K_e = lk["matrices_cells"](
                        u_e.astype(f_lo), dNdx_l.astype(f_lo),
                        wdetJ_l.astype(f_lo), x_q_l.astype(f_lo),
                        [f.astype(f_lo) for f in fields_e],
                        Ct.astype(f_lo),
                        [jnp.asarray(s, f_lo) for s in sc],
                    )
                else:
                    K_e = lk["matrices_cells"](
                        u_e, dNdx_l, wdetJ_l, x_q_l, fields_e, Ct, sc
                    )
                R_part = R_part + assemble(i, dofmap_l, r_e, u_.dtype)
                K_es.append(K_e)
                new_states.append(st_new)
            R = reduce_assembled(R_part) - f_ext_v
            R = jnp.where(bc_mask, 0.0, R)
            return R, K_es, new_states

        def evaluate(u_):
            return evaluate_g(
                u_, tables, states, esv_c, props_c, scales, f_ext, mixed
            )

        def residual_norm_g(u_, tbls, sts, ecs, pcs, scs, f_ext_v):
            u_full = gather_full(u_)
            R_part = jnp.zeros(nd_p, u_.dtype)
            for i, (qi, lk, (dNdx_l, wdetJ_l, x_q_l, dofmap_l), st_l, ec, pc,
                    sc) in enumerate(zip(
                qinfos, locals_, tbls, sts, ecs, pcs, scs
            )):
                u_e = gather_e(i, u_full, dofmap_l)
                x = lk["point_inputs"](u_e, dNdx_l, x_q_l, ec)
                flux, st_new = lk["flux"](x, st_l, pc, dt)
                fields_e = lk["fields_from"](flux, st_new, u_e.shape[0])
                r_e = lk["residual_cells"](u_e, dNdx_l, wdetJ_l, x_q_l, fields_e, sc)
                R_part = R_part + assemble(i, dofmap_l, r_e, u_.dtype)
            R = reduce_assembled(R_part) - f_ext_v
            return norm(jnp.where(bc_mask, 0.0, R))

        def residual_norm(u_):
            return residual_norm_g(
                u_, tables, states, esv_c, props_c, scales, f_ext
            )

        def newton_update(u, R, K_es, res_norm, rnorm=None):
            # CG runs in the TANGENT dtype (f32 under precision="mixed");
            # ``rnorm`` is the line-search residual norm (the f32-warmup
            # phase passes its all-f32 variant)
            rnorm = rnorm or residual_norm
            cg_dtype = K_es[0].dtype

            # --- explicit symmetric diagonal scaling (mixed only): solve
            # (S K S) x^ = S b with S = diag(1/sqrt(|diag K|)) so every CG
            # vector is O(1) — the f32 recurrences then survive the 1e12
            # stiffness contrast of penalty-inclusion problems -------------
            if mixed:
                diag = jnp.zeros(nd_p, cg_dtype)
                for i, (tbl, K_e) in enumerate(zip(tables, K_es)):
                    diag = diag + assemble(
                        i, tbl[3], jnp.diagonal(K_e, axis1=1, axis2=2),
                        cg_dtype,
                    )
                diag = reduce_assembled(diag)
                diag = jnp.where(
                    bc_mask | (jnp.abs(diag) < 1e-30), 1.0, jnp.abs(diag)
                )
                s_vec = jax.lax.rsqrt(diag)
                s_inv = diag * s_vec  # = sqrt(diag), exact-enough inverse
                s_full = gather_full(s_vec)
                K_ops = []
                for i, (tbl, K_e) in enumerate(zip(tables, K_es)):
                    s_e = gather_e(i, s_full, tbl[3])
                    K_ops.append(K_e * s_e[:, :, None] * s_e[:, None, :])
            else:
                s_vec = s_inv = None
                K_ops = K_es

            if use_block_smoother:
                # node-block Jacobi accumulated over all qmaps (see the
                # specialized step's newton_update for the scheme); under
                # scaling the blocks come from the SCALED operator
                cols = []
                for bcomp in range(ncomp_sp):
                    col = jnp.zeros(nd_p, cg_dtype)
                    for i, (tbl, K_e) in enumerate(zip(tables, K_ops)):
                        dofmap_l = tbl[3]
                        jj = _np.arange(K_e.shape[1])
                        node_col0 = jnp.asarray((jj // ncomp_sp) * ncomp_sp)
                        col = col + assemble(
                            i, dofmap_l, K_e[:, jj, node_col0 + bcomp],
                            cg_dtype,
                        )
                    cols.append(reduce_assembled(col))
                Bm = jnp.stack(cols, axis=-1).reshape(-1, ncomp_sp, ncomp_sp)
                mb = bc_mask.reshape(-1, ncomp_sp).astype(cg_dtype)
                keep = 1.0 - mb
                Bm = Bm * keep[:, :, None] * keep[:, None, :]
                eye = jnp.eye(ncomp_sp, dtype=cg_dtype)
                Bm = Bm + eye * mb[:, :, None]
                tr = jnp.einsum("naa->n", jnp.abs(Bm))
                Bm = Bm + eye * jnp.where(
                    tr < 1e-30, 1.0, 1e-14 * tr
                )[:, None, None]
                Binv = _sym_block_inv(Bm, eye)

                def smooth(r):
                    return jnp.einsum(
                        "nab,nb->na", Binv, r.reshape(-1, ncomp_sp)
                    ).reshape(-1)

            elif mixed:
                # scaled operator has unit diagonal: Jacobi smoother = I
                def smooth(r):
                    return r

            else:
                diag = jnp.zeros(nd_p, cg_dtype)
                for i, (tbl, K_e) in enumerate(zip(tables, K_es)):
                    dofmap_l = tbl[3]
                    diag = diag + assemble(
                        i, dofmap_l, jnp.diagonal(K_e, axis1=1, axis2=2),
                        cg_dtype,
                    )
                diag = reduce_assembled(diag)
                diag = jnp.where(
                    bc_mask | (jnp.abs(diag) < 1e-30), 1.0, diag
                )

                def smooth(r):
                    return r / diag

            def Av(v):
                v0 = jnp.where(bc_mask, 0.0, v)
                v_full = gather_full(v0)
                y = jnp.zeros(nd_p, v.dtype)
                for i, ((dNdx_l, wdetJ_l, x_q_l, dofmap_l), K_e) in enumerate(
                    zip(tables, K_ops)
                ):
                    y_e = jnp.einsum(
                        "eij,ej->ei", K_e, gather_e(i, v_full, dofmap_l)
                    )
                    y = y + assemble(i, dofmap_l, y_e, v.dtype)
                y = reduce_assembled(y)
                return jnp.where(bc_mask, v, y)

            b = (-R).astype(cg_dtype)
            if mixed:
                b = b * s_vec
            b = jnp.where(bc_mask, 0.0, b)
            x0 = jnp.zeros_like(b)
            r0 = b
            z0 = smooth(r0) + coarse_correct(r0, s_inv)
            p0 = z0

            def cg_body(cg):
                x, r, z, p, rz, k = cg
                Ap = Av(p)
                den = vdot(p, Ap)
                alpha = jnp.where(jnp.abs(den) > 1e-30, rz / den, 0.0)
                x = x + alpha * p
                r = r - alpha * Ap
                z = smooth(r) + coarse_correct(r, s_inv)
                rz_new = vdot(r, z)
                beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
                return (x, r, z, p * beta + z, rz_new, k + 1)

            # n_cg is a budget: exit as soon as the preconditioned residual
            # drops below cg_rtol^2 x initial (same early-exit CG as the
            # specialized step)
            rz0 = vdot(r0, z0)
            cg_tol2 = (cg_rtol * cg_rtol) * jnp.abs(rz0)

            def cg_cond(cg):
                *_, rz, k = cg
                return jnp.logical_and(k < n_cg, jnp.abs(rz) > cg_tol2)

            du, _, _, _, _, cg_k = jax.lax.while_loop(
                cg_cond, cg_body, (x0, r0, z0, p0, rz0, 0)
            )
            if mixed:
                du = du * s_vec  # back to physical variables
            du = du.astype(u.dtype)

            def ls_cond(c):
                alpha, n_try, k = c
                bad = jnp.logical_or(
                    ~jnp.isfinite(n_try), n_try >= (1 - 1e-4 * alpha) * res_norm
                )
                return jnp.logical_and(bad, k < n_backtracks)

            def ls_body(c):
                alpha, _, k = c
                alpha = alpha * 0.5
                return (alpha, rnorm(u + alpha * du), k + 1)

            n1 = rnorm(u + du)
            alpha, n_fin, _ = jax.lax.while_loop(ls_cond, ls_body, (1.0, n1, 0))
            take = jnp.isfinite(n_fin) & (n_fin < res_norm)
            return jnp.where(take, u + alpha * du, u), cg_k

        # --- f32 WARMUP PHASE (mixed only): f64 arithmetic is emulated on
        # TPU (a single f64 residual-integrand einsum costs ~16 ms at the
        # tet-P2 bench size vs ~1 ms for the f32 banded path), so most of a
        # mixed step's time was f64 evaluate/line-search passes. Run Newton
        # on an ALL-f32 copy of the problem first — banded gathers, MXU
        # einsums — until the f32 floor or no line-search progress, then
        # polish with the f64 loop below (usually 1-2 f64 iterations).
        # States recompute from (u, entering s0) each evaluate, so the
        # warmup's states are simply discarded.
        it32 = jnp.int32(0) if mixed else 0
        cg32 = jnp.int32(0) if mixed else 0
        if mixed and f32_warmup:
            def lo(t):
                return jax.tree.map(
                    lambda a: a.astype(f_lo)
                    if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                    else a,
                    t,
                )

            tables32 = tuple(lo(tbl) for tbl in tables)
            states32 = tuple(lo(st) for st in states)
            esv32 = tuple(lo(e) for e in esv_c)
            props32 = tuple(lo(p) for p in props_c)
            scales32 = [
                [jnp.asarray(s, f_lo) for s in sc] for sc in scales
            ]
            f_ext32 = f_ext.astype(f_lo)

            def evaluate32(u_):
                return evaluate_g(
                    u_, tables32, states32, esv32, props32, scales32,
                    f_ext32, False,
                )

            def rnorm32(u_):
                return residual_norm_g(
                    u_, tables32, states32, esv32, props32, scales32,
                    f_ext32,
                )

            u32 = u.astype(f_lo)
            R32, K_es, _ = evaluate32(u32)
            res32 = norm(R32)
            res032 = jnp.maximum(res32, 1e-30)
            coarse_correct = make_coarse_correct(
                build_coarse(K_es) if two_level else None
            )

            def body32(carry):
                u_, R_, K_, res_, it, cgs, _ = carry
                u_new, cg_k = newton_update(u_, R_, K_, res_, rnorm=rnorm32)
                R_n, K_n, _ = evaluate32(u_new)
                res_n = norm(R_n)
                # "still worth an f32 iteration" = the line search moved AND
                # the residual dropped by >= 30%. Near the f32 floor the
                # line search keeps accepting noise-level wiggles, so a
                # moved-only exit burns the whole Newton budget (measured:
                # 14-21 its/step); far from the floor a Newton iteration
                # reduces the residual by orders of magnitude, so the 0.7
                # factor never triggers early.
                progress = jnp.any(u_new != u_) & (res_n < 0.7 * res_)
                return (
                    u_new, R_n, K_n, res_n, it + 1, cgs + cg_k, progress
                )

            def cond32(carry):
                _, _, _, res_, it, _, progress = carry
                # stop at the f32 floor (no further progress), the caller's
                # tolerance, or one-below the Newton budget so the f64
                # polish always gets at least one iteration
                return (
                    (it < n_newton - 1)
                    & (res_ > jnp.maximum(rtol, 2e-5) * res032 + atol)
                    & progress
                )

            u32, R32, K_es, res32, it32, cg32, _ = jax.lax.while_loop(
                cond32, body32,
                (u32, R32, K_es, res32, jnp.int32(0), jnp.int32(0), True),
            )
            u = jnp.where(bc_mask, bc_vals, u32.astype(u.dtype))

        R, K_es, st_out = evaluate(u)
        res = norm(R)
        if mixed and f32_warmup:
            # normalizer/returned rn0 = the step's TRUE entering residual,
            # measured by the warmup before it iterated (f32-relative error
            # ~1e-6 on the large entering residual — fine for a normalizer);
            # the f64 polish target rtol*res0 is then the honest one
            res0 = jnp.maximum(res032.astype(u.dtype), res * 0 + 1e-30)
            res_entering = res0
        else:
            res0 = jnp.maximum(res, 1e-30)
            res_entering = res
        # frozen coarse factor from the SAME entering tangents the first
        # Newton update uses (late-bound name referenced by newton_update)
        coarse_correct = make_coarse_correct(
            build_coarse(K_es) if two_level else None
        )

        def newton_body(carry):
            u, R, K_es, sts, res, it, cg_sum = carry
            u_new, cg_k = newton_update(u, R, K_es, res)
            R_new, K_new, st_new = evaluate(u_new)
            return (
                u_new, R_new, K_new, st_new, norm(R_new), it + 1,
                cg_sum + cg_k,
            )

        def newton_cond(carry):
            _, _, _, _, res_prev, it, _ = carry
            return jnp.logical_and(it < n_newton, res_prev > rtol * res0 + atol)

        u, R, K_es, st_out, res_norm_f, n_it, cg_sum = jax.lax.while_loop(
            newton_cond, newton_body, (u, R, K_es, st_out, res, 0, 0)
        )
        return (
            u, tuple(st_out), res_norm_f, res_entering,
            n_it + it32, cg_sum + cg32,
        )

    def unpad_states(states):
        out = []
        for qi, st in zip(qinfos, states):
            npts = qi["ne_real"] * qi["nq"]
            out.append(jax.tree.map(lambda a: a[:npts], st))
        return out

    def step(u, states, bc_mask, bc_vals, dt=0.0, scales=None, f_ext=None):
        u = jnp.asarray(u)
        if mixed:
            u = u.astype(f_hi)
            states = [
                jax.tree.map(
                    lambda a: jnp.asarray(a).astype(f_hi)
                    if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                    else jnp.asarray(a),
                    st,
                )
                for st in states
            ]
        states_p = pad_states(states)
        if scales is None:
            scales = [
                [problem._scale_value(s) for s in t["scales"]]
                for t in problem._terms
            ]
        scales_flat = tuple(
            jnp.asarray(s, u.dtype) for ss in scales for s in ss
        )
        f_ext = (
            jnp.zeros(ndofs, u.dtype)
            if f_ext is None
            else jnp.asarray(f_ext, u.dtype)
        )
        bc_mask = jnp.asarray(bc_mask)
        bc_vals = jnp.asarray(bc_vals, u.dtype)
        if shard_dofs and nd_p != ndofs:
            # padded dofs are pinned to 0 like Dirichlet rows
            u = jnp.concatenate([u, jnp.zeros(nd_p - ndofs, u.dtype)])
            bc_mask = jnp.concatenate(
                [bc_mask, jnp.ones(nd_p - ndofs, bc_mask.dtype)]
            )
            bc_vals = jnp.concatenate(
                [bc_vals, jnp.zeros(nd_p - ndofs, bc_vals.dtype)]
            )
            f_ext = jnp.concatenate(
                [f_ext, jnp.zeros(nd_p - ndofs, f_ext.dtype)]
            )
        u_new, new_states, rn, rn0, n_it, cg_sum = _step(
            u,
            tuple(qi["tables"] for qi in qinfos),
            tuple(qi["cdof"] for qi in qinfos),
            tuple(states_p),
            tuple(esv_consts),
            tuple(props_consts),
            bc_mask,
            bc_vals,
            jnp.asarray(dt, u.dtype),
            scales_flat,
            f_ext,
        )
        if return_info == "stats":
            return (
                u_new[:ndofs], unpad_states(new_states), rn, rn0,
                (n_it, cg_sum),
            )
        if return_info:
            return u_new[:ndofs], unpad_states(new_states), rn, rn0
        return u_new[:ndofs], unpad_states(new_states), rn

    return jax.jit(step), pad_states


def make_sharded_blocked_step(
    blocked,
    mesh: Mesh,
    axis="cells",
    n_newton=12,
    n_cg=200,
    n_backtracks=10,
    rtol=None,
    atol=0.0,
    pc="two_level",
    pc_boxes=8,
    smoother=None,
    cg_rtol=1e-8,
    use_banded=True,
):
    """Fused sharded Newton step for MONOLITHIC BLOCKED multi-field problems.

    Closes the last problem class off the TPU path: a
    :class:`~dolfinx_materials_tpu.solvers.BlockedNonlinearProblem` — multiple
    fields with cross-field consistent-tangent coupling blocks and interface
    laws — runs as ONE fused XLA program with cells (and interface facets)
    sharded over ``mesh``:

    - the concatenated dof vector z is replicated; each field's qmaps run the
      same sharded evaluate/assemble machinery as the general step;
    - COUPLING ESVs (the ``(row, col, qmap, y, x, x_expr)`` declarations) are
      re-evaluated per Newton iteration from the CURRENT col-field iterate on
      the row qmap's (sharded) cells, exactly like the host solver's
      ``_refresh_esvs``;
    - off-diagonal operator blocks K_rc = scale * B_y^T C_(y,x) B_x^col are
      computed per sharded cell from the material's packed tangent and applied
      inside the block CG matvec;
    - interface terms shard over FACETS: per-shard residual/stiffness
      contributions are partial-assembled and psum'd with everything else;
    - the linear solve is preconditioned BiCGStab on the monolithic operator,
      with concatenated Dirichlet masking; line search backtracks on the
      flux-only blocked residual.

    Preconditioning matches the single-field fused steps (closes the round-3
    roadmap's last fused-step gap): ``pc="two_level"`` (default) adds a
    FROZEN additive coarse correction built from per-FIELD coordinate-box
    node aggregates — the monolithic coarse operator ``P^T K P`` accumulates
    every field's diagonal blocks, the cross-field coupling blocks at their
    (row-field, col-field) coarse offsets, AND the interface stiffness
    blocks, then is dense-inverted once per load step. The smoother is
    per-field node-block Jacobi on vector fields (scalar diagonal on scalar
    fields); ``smoother="jacobi"`` opts every field back to the scalar
    diagonal. ``n_cg`` is a budget: BiCGStab exits once the residual drops
    ``cg_rtol`` relative to ``|b|``.

    Returns ``(step, pad_states)`` with
    ``step(z, states, bc_mask, bc_vals, dt=0.0) -> (z_new, states, |R|)``
    where ``states`` is the flat list of internal-state pytrees over all
    problems' qmaps (order: problems[0].qmaps..., problems[1].qmaps...).
    """
    import numpy as _np

    from ..fem.forms import Ctx
    from ..state import _slices as _mk_slices

    axis = tuple(axis) if isinstance(axis, (tuple, list)) else axis
    ndev = _axis_size(mesh, axis)
    offsets = [int(o) for o in blocked.offsets]
    sizes = [int(s) for s in blocked.sizes]
    ndofs = offsets[-1]
    nfields = len(blocked.problems)
    if rtol is None:
        rtol = 1e-10 if float(jnp.finfo(jnp.zeros(0).dtype).eps) < 1e-9 else 1e-6

    field_ncomp = [int(p.u.space.ncomp) for p in blocked.problems]
    if smoother not in (None, "jacobi", "block"):
        raise ValueError(
            f"smoother must be None, 'jacobi' or 'block', got {smoother!r}"
        )
    # node-block Jacobi by default only when a 3D vector field is present
    # (see the specialized step's measured 2D cost/benefit note); scalar
    # fields always take the plain diagonal (their 1x1 "block" IS it)
    default_sm = "block" if any(nc >= 3 for nc in field_ncomp) else "jacobi"
    use_block_smoother = (smoother or default_sm) == "block" and any(
        nc > 1 for nc in field_ncomp
    )

    two_level = pc == "two_level"
    if two_level:
        # per-field coordinate-box aggregates, stacked at per-field coarse
        # offsets so the monolithic coarse operator keeps the cross-field
        # coupling structure (the whole point over field-wise corrections)
        coarse_offsets = [0]
        cdof_fields = []
        budget = max(64, 2048 // nfields)
        for p in blocked.problems:
            nci, cd = _coord_agg_cdofs(p.u.space, pc_boxes, budget=budget)
            cdof_fields.append(cd)
            coarse_offsets.append(coarse_offsets[-1] + nci)
        ncoarse = coarse_offsets[-1]
        cdof_ids = jnp.asarray(
            _np.concatenate(
                [
                    cd + off
                    for cd, off in zip(cdof_fields, coarse_offsets[:-1])
                ]
            ).astype(_np.int32)
        )
    else:
        ncoarse = 1
        cdof_fields = None

    # ---- per-(field, qmap) static structure ------------------------------
    qinfos = []
    for fi, prob in enumerate(blocked.problems):
        for t in prob._terms:
            qmap = t["qmap"]
            dom = qmap.domain
            material = qmap.material
            if material.rotation_matrix is not None:
                R = _np.asarray(material.rotation_matrix)
                if R.shape != (3, 3):
                    # raise (not assert): see the general step's guard
                    raise NotImplementedError(
                        "fused blocked step supports constant (3,3) "
                        f"rotations; got rotation_matrix of shape {R.shape}"
                    )
            dNdx, ne_real = pad_to_multiple(_np.asarray(dom.dNdx), ndev)
            wdetJ, _ = pad_to_multiple(_np.asarray(dom.wdetJ), ndev)
            x_q, _ = pad_to_multiple(_np.asarray(dom.x_q), ndev)
            dofmap, _ = pad_to_multiple(_np.asarray(dom.dofmap), ndev)

            # couplings whose row qmap is this one: their x-ESV is evaluated
            # from the COL field on these cells; col-side basis tables padded
            # to the same cell count
            my_coups = [
                c for c in blocked._couplings if c["qmap"] is qmap
            ]
            coup_tabs = []
            for c in my_coups:
                cd = c["col_dom"]
                cdN, _ = pad_to_multiple(_np.asarray(cd.dNdx), ndev)
                cxq, _ = pad_to_multiple(_np.asarray(cd.x_q), ndev)
                cdm, _ = pad_to_multiple(_np.asarray(cd.dofmap), ndev)
                ccd = (
                    cdof_fields[c["col"]][cdm] + coarse_offsets[c["col"]]
                    if two_level
                    else _np.zeros_like(cdm)
                )
                coup_tabs.append(
                    (
                        jnp.asarray(cdN),
                        jnp.asarray(cxq),
                        jnp.asarray(cdm),
                        jnp.asarray(ccd.astype(_np.int32)),
                    )
                )

            # differentiable-input layout
            grad_exprs = [qmap.gradient_exprs[g] for g in material.gradient_names]
            esv_entries = []
            for name, size in material.external_state_variables.items():
                coup_idx = next(
                    (k for k, c in enumerate(my_coups) if c["x"] == name), None
                )
                if coup_idx is not None:
                    esv_entries.append((name, size, "coupled", coup_idx))
                elif name in qmap.esv_exprs:
                    esv_entries.append((name, size, "expr", None))
                else:
                    esv_entries.append((name, size, "const", None))

            field_names = t["field_names"]
            exprs = t["exprs"]
            scales = [prob._scale_value(s) for s in t["scales"]]
            # diagonal tangent structure (same-field inputs only)
            tstruct = []
            for (k, by, bx) in t["block_keys"]:
                x_expr = qmap.gradient_exprs.get(bx) or qmap.esv_exprs.get(bx)
                sl, sy, sx = qmap._block_slices[(by, bx)]
                tstruct.append((k, x_expr, sl, sy, sx))
            # coupling (off-diagonal) structure
            coup_struct = []
            for ci, c in enumerate(my_coups):
                sl, sy, sx = qmap._block_slices[(c["y"], c["x"])]
                k_term = field_names.index(c["y"])
                coup_struct.append(
                    dict(
                        ci=ci,
                        row=fi,
                        col=c["col"],
                        k_term=k_term,
                        sl=sl,
                        sy=sy,
                        sx=sx,
                        scale=float(c["scale"]),
                        col_nloc=c["col_dom"].nloc,
                        col_ncomp=c["col_dom"].ncomp,
                    )
                )

            flux_slices = _mk_slices(material.fluxes)
            field_getters = []
            for name in field_names:
                if name in flux_slices:
                    field_getters.append(("flux", flux_slices[name]))
                else:
                    field_getters.append(("isv", name))

            esv_consts = {}
            npts_pad = dNdx.shape[0] * dom.nq
            npts_real = ne_real * dom.nq
            for name, size, kind, _ in esv_entries:
                if kind != "const":
                    continue
                v = material.external_state.get(name)
                arr = (
                    material._to_batched(v, npts_real, size)
                    if v is not None
                    else jnp.zeros((npts_real, size))
                )
                esv_consts[name] = jnp.concatenate(
                    [arr, jnp.broadcast_to(arr[-1:], (npts_pad - npts_real, size))]
                )

            # spatially-varying material properties, padded per point with the
            # LAST real value (same rationale as the ESV padding above)
            props_consts = {}
            for name, size in getattr(
                material.behavior, "material_properties", {}
            ).items():
                v = material.material_property_values.get(name)
                if v is None:
                    raise ValueError(f"material property '{name}' not set")
                arr = material._to_batched(v, npts_real, size)
                arr = jnp.concatenate(
                    [arr, jnp.broadcast_to(arr[-1:], (npts_pad - npts_real, size))]
                )
                props_consts[name] = arr[:, 0] if size == 1 else arr

            qinfos.append(
                dict(
                    field=fi,
                    qmap=qmap,
                    material=material,
                    ne_real=ne_real,
                    ne_pad=dNdx.shape[0],
                    ne_cells=_np.asarray(dom.dofmap).shape[0],
                    ndof_el=_np.asarray(dom.dofmap).shape[1],
                    # banded lane-gather engine for this qmap's FIELD-local
                    # gathers/assembly (same redundant-full pattern as the
                    # general step); coupling/interface gathers stay scalar
                    banded=(
                        dom
                        if (use_banded and getattr(dom, "_banded", None))
                        else None
                    ),
                    nq=dom.nq,
                    nloc=dom.nloc,
                    ncomp=dom.ncomp,
                    N_tab=dom.N,
                    # coarse-dof table at this field's coarse offset (pads ->
                    # field dof 0: zero K_e rows on padded cells, harmless)
                    cdof=(
                        jnp.asarray(
                            (
                                cdof_fields[fi][dofmap] + coarse_offsets[fi]
                            ).astype(_np.int32)
                        )
                        if two_level
                        else jnp.zeros(dofmap.shape, jnp.int32)
                    ),
                    tables=(
                        jnp.asarray(dNdx),
                        jnp.asarray(wdetJ),
                        jnp.asarray(x_q),
                        jnp.asarray(dofmap),
                    ),
                    coup_tabs=tuple(coup_tabs),
                    my_coups=my_coups,
                    coup_struct=coup_struct,
                    grad_exprs=grad_exprs,
                    esv_entries=esv_entries,
                    esv_exprs={
                        n: qmap.esv_exprs[n]
                        for n, _, k, _ in esv_entries
                        if k == "expr"
                    },
                    exprs=exprs,
                    scales=scales,
                    tstruct=tstruct,
                    field_getters=field_getters,
                    esv_consts=esv_consts,
                    props_consts=props_consts,
                    init_tpl=material.behavior.init_state(),
                )
            )

    # ---- interface tables (sharded over facets) --------------------------
    itf_infos = []
    for itf in blocked.interfaces:
        d = itf.domain
        w, nf_real = pad_to_multiple(_np.asarray(d.w), ndev)  # (nf, nq): pad w=0
        N = jnp.asarray(d.N)
        dofs1, _ = pad_to_multiple(_np.asarray(d.dofs1), ndev)
        dofs2, _ = pad_to_multiple(_np.asarray(d.dofs2), ndev)
        if two_level:
            cd1 = cdof_fields[itf.i][dofs1] + coarse_offsets[itf.i]
            cd2 = cdof_fields[itf.j][dofs2] + coarse_offsets[itf.j]
        else:
            cd1, cd2 = _np.zeros_like(dofs1), _np.zeros_like(dofs2)
        itf_infos.append(
            dict(
                i=itf.i,
                j=itf.j,
                traction=itf.traction,
                nq=d.nq,
                nloc_f=d.nloc_f,
                ncomp=d.ncomp,
                N=N,
                tables=(
                    jnp.asarray(w),
                    jnp.asarray(dofs1.reshape(len(w), -1)),
                    jnp.asarray(dofs2.reshape(len(w), -1)),
                    jnp.asarray(cd1.reshape(len(w), -1).astype(_np.int32)),
                    jnp.asarray(cd2.reshape(len(w), -1).astype(_np.int32)),
                ),
            )
        )

    def pad_states(states):
        out = []
        for qi, st in zip(qinfos, states):
            npts = qi["ne_pad"] * qi["nq"]

            def pad_leaf(a, tpl):
                a = jnp.asarray(a)
                pad = npts - a.shape[0]
                if pad == 0:
                    return a
                fill = jnp.broadcast_to(
                    jnp.asarray(tpl, a.dtype), (pad,) + a.shape[1:]
                )
                return jnp.concatenate([a, fill])

            out.append(jax.tree.map(pad_leaf, st, qi["init_tpl"]))
        return out

    def unpad_states(states):
        return [
            jax.tree.map(lambda a: a[: qi["ne_real"] * qi["nq"]], st)
            for qi, st in zip(qinfos, states)
        ]

    # ---- per-qmap kernels -------------------------------------------------
    def make_local(qi):
        material = qi["material"]
        nloc, ncomp, nq = qi["nloc"], qi["ncomp"], qi["nq"]
        N_tab = qi["N_tab"]
        in_slices = material._in_slices
        point_update = material._point_update
        point_flux = material._point_flux
        fast_update = material._fast_update
        fast_flux = material._fast_flux
        # same fast-path/props invariant guard as the general make_local
        # (Material._build_batched gates the fast path off when properties
        # are declared; enforce that here so the dropped props_l stays safe)
        if getattr(material.behavior, "material_properties", {}) and (
            fast_update is not None or fast_flux is not None
        ):
            raise NotImplementedError(
                "behavior declares material_properties but also a whole-batch "
                "fast path; the fused blocked step's fast path ignores "
                "properties (Material._build_batched is expected to gate this)"
            )
        exprs, tstruct = qi["exprs"], qi["tstruct"]
        field_getters = qi["field_getters"]
        scales = qi["scales"]

        def cell_eval(expr, ue, d, x, nl, nc):
            un = ue.reshape(nl, nc)
            u_q = N_tab @ un
            g_q = jnp.einsum("qvi,vc->qci", d, un)
            return jax.vmap(lambda u_, g_, x_: expr(Ctx(u_, g_, x_)))(u_q, g_q, x)

        def point_inputs(u_e, dNdx_l, x_q_l, coup_vals):
            parts = []
            for expr in qi["grad_exprs"]:
                g = jax.vmap(
                    lambda ue, d, x: cell_eval(expr, ue, d, x, nloc, ncomp)
                )(u_e, dNdx_l, x_q_l)
                parts.append(g.reshape(g.shape[0] * nq, -1))
            for name, size, kind, cidx in qi["esv_entries"]:
                if kind == "expr":
                    g = jax.vmap(
                        lambda ue, d, x: cell_eval(
                            qi["esv_exprs"][name], ue, d, x, nloc, ncomp
                        )
                    )(u_e, dNdx_l, x_q_l)
                    parts.append(g.reshape(g.shape[0] * nq, -1))
                elif kind == "coupled":
                    parts.append(coup_vals[cidx])
                else:
                    parts.append(qi["_esv_l"][name])
            return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

        def apply_rot(x, slices, sizes, transpose, n):
            if material.rotation_matrix is None:
                return x
            ops = material._rotation_ops(n, x.dtype)
            return material._rotate_cols(x, slices, sizes, ops, transpose)

        def integrate_local(x, state_l, props_l, dt):
            n = x.shape[0]
            x = apply_rot(x, in_slices, material._input_sizes, False, n)
            if fast_update is not None:
                flux, Ct, new_state = fast_update(x, state_l, dt)
                Ct = Ct.reshape(n, -1)
            else:
                flux, Ct, new_state = jax.vmap(
                    lambda xi, pi, si: point_update(xi, pi, si, dt)
                )(x, props_l, state_l)
            if material.rotation_matrix is not None:
                ops = material._rotation_ops(n, x.dtype)
                flux = material._rotate_cols(
                    flux, _mk_slices(material.fluxes), material.fluxes, ops, True
                )
                Ct = material._rotate_tangent(Ct, ops)
            return flux, Ct, new_state

        def flux_local(x, state_l, props_l, dt):
            n = x.shape[0]
            x = apply_rot(x, in_slices, material._input_sizes, False, n)
            if fast_flux is not None:
                flux, new_state = fast_flux(x, state_l, dt)
            elif fast_update is not None:
                flux, _, new_state = fast_update(x, state_l, dt)
            else:
                flux, new_state = jax.vmap(
                    lambda xi, pi, si: point_flux(xi, pi, si, dt)
                )(x, props_l, state_l)
            if material.rotation_matrix is not None:
                ops = material._rotation_ops(n, x.dtype)
                flux = material._rotate_cols(
                    flux, _mk_slices(material.fluxes), material.fluxes, ops, True
                )
            return flux, new_state

        def fields_from(flux, new_state, ne_l):
            out = []
            for kind, key in field_getters:
                f = (
                    flux[:, key]
                    if kind == "flux"
                    else jnp.reshape(new_state[key], (flux.shape[0], -1))
                )
                out.append(f.reshape(ne_l, nq, -1))
            return out

        def residual_cells(u_e, dNdx_l, wdetJ_l, x_q_l, fields_e):
            def cell_r(ue, d, x, w, flds):
                def work(w_):
                    tot = 0.0
                    for sc, expr, fl in zip(scales, exprs, flds):
                        g = cell_eval(expr, w_, d, x, nloc, ncomp)
                        tot = tot + sc * jnp.sum(w[:, None] * g * fl)
                    return tot

                return jax.grad(work)(ue)

            return jax.vmap(cell_r)(u_e, dNdx_l, x_q_l, wdetJ_l, fields_e)

        def diag_matrices(u_e, dNdx_l, wdetJ_l, x_q_l, fields_e, Ct):
            ne_l = u_e.shape[0]
            Cs = [
                Ct[:, sl].reshape(ne_l, nq, sy, sx)
                for (_, _, sl, sy, sx) in tstruct
            ]

            def cell_K(ue, d, x, w, flds, *Cblocks):
                Bcache = {}

                def B_of(expr):
                    key = id(expr)
                    if key not in Bcache:
                        Bcache[key] = jax.jacfwd(
                            lambda w_: cell_eval(expr, w_, d, x, nloc, ncomp)
                        )(ue)
                    return Bcache[key]

                nd_el = nloc * ncomp
                K = jnp.zeros((nd_el, nd_el), ue.dtype)
                for (kterm, x_expr, sl, sy, sx), C in zip(tstruct, Cblocks):
                    By = B_of(exprs[kterm])
                    Bx = B_of(x_expr)
                    K = K + scales[kterm] * jnp.einsum(
                        "qai,qab,qbj,q->ij", By, C, Bx, w
                    )

                def work(w_):
                    tot = 0.0
                    for sc, expr, fl in zip(scales, exprs, flds):
                        g = cell_eval(expr, w_, d, x, nloc, ncomp)
                        tot = tot + sc * jnp.sum(w[:, None] * g * fl)
                    return tot

                return K + jax.hessian(work)(ue)

            return jax.vmap(cell_K)(u_e, dNdx_l, x_q_l, wdetJ_l, fields_e, *Cs)

        def coupling_matrices(u_e, dNdx_l, wdetJ_l, x_q_l, Ct, coup_cols):
            """K_rc_e per coupling: (ne_l, nd_row, nd_col)."""
            out = []
            ne_l = u_e.shape[0]
            for cs, (cdN_l, cxq_l, _, _), (col_ue,) in zip(
                qi["coup_struct"], qi["_coup_tabs_l"], coup_cols
            ):
                C = Ct[:, cs["sl"]].reshape(ne_l, nq, cs["sy"], cs["sx"])
                c = qi["my_coups"][cs["ci"]]
                x_expr = c["x_expr_fn"]
                cnl, cnc = cs["col_nloc"], cs["col_ncomp"]

                def cell_Krc(ue, cue, d, cd, x, cx, w, Cb):
                    By = jax.jacfwd(
                        lambda w_: cell_eval(exprs[cs["k_term"]], w_, d, x, nloc, ncomp)
                    )(ue)

                    def col_eval(w_):
                        un = w_.reshape(cnl, cnc)
                        u_q = qi["_col_N"][cs["ci"]] @ un
                        g_q = jnp.einsum("qvi,vc->qci", cd, un)
                        return jax.vmap(
                            lambda u_, g_, x_: x_expr(Ctx(u_, g_, x_))
                        )(u_q, g_q, cx)

                    Bx = jax.jacfwd(col_eval)(cue)
                    return (cs["scale"] * scales[cs["k_term"]]) * jnp.einsum(
                        "qai,qab,qbj,q->ij", By, Cb, Bx, w
                    )

                out.append(
                    jax.vmap(cell_Krc)(
                        u_e, col_ue, dNdx_l, cdN_l, x_q_l, cxq_l, wdetJ_l, C
                    )
                )
            return out

        return dict(
            point_inputs=point_inputs,
            integrate=integrate_local,
            flux=flux_local,
            fields_from=fields_from,
            residual_cells=residual_cells,
            diag_matrices=diag_matrices,
            coupling_matrices=coupling_matrices,
        )

    # resolve x_expr functions + col N tables host-side
    for qi in qinfos:
        qi["_col_N"] = {}
        for cs, c in zip(qi["coup_struct"], qi["my_coups"]):
            # re-derive the x_expr from the coupling's eval closure is not
            # possible; BlockedNonlinearProblem stores it implicitly — stash
            # it at coupling-declaration time instead
            assert "x_expr_fn" in c, (
                "make_sharded_blocked_step needs the coupling's x_expr: "
                "BlockedNonlinearProblem stores it as c['x_expr_fn']"
            )
            qi["_col_N"][cs["ci"]] = c["col_dom"].N

    locals_ = [make_local(qi) for qi in qinfos]

    P_ax, P_rep = P(axis), P()
    qtab_specs = tuple((P_ax,) * 4 for _ in qinfos)
    qcdof_specs = tuple(P_ax for _ in qinfos)
    ctab_specs = tuple(
        tuple((P_ax, P_ax, P_ax, P_ax) for _ in qi["coup_tabs"])
        for qi in qinfos
    )
    state_specs = tuple(P_ax for _ in qinfos)
    esv_specs = tuple(
        jax.tree.map(lambda _: P_ax, qi["esv_consts"]) for qi in qinfos
    )
    prop_specs = tuple(
        jax.tree.map(lambda _: P_ax, qi["props_consts"]) for qi in qinfos
    )
    itab_specs = tuple((P_ax,) * 5 for _ in itf_infos)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P_rep, qtab_specs, qcdof_specs, ctab_specs, state_specs,
            esv_specs, prop_specs, itab_specs, P_rep, P_rep, P_rep,
        ),
        out_specs=(P_rep, tuple(P_ax for _ in qinfos), P_rep),
        check_vma=False,
    )
    def _step(z, qtabs, qcdofs, ctabs, states, esv_c, props_c, itabs, bc_mask,
              bc_vals, dt):
        def norm(v):
            return jnp.sqrt(jnp.vdot(v, v))

        def split(v):
            return [v[offsets[i] : offsets[i] + sizes[i]] for i in range(nfields)]

        z = jnp.where(bc_mask, bc_vals, z)

        # stash sharded tables on qinfos for the kernels (the kernels must
        # read the SHARD-LOCAL esv/props slices, not the replicated closure
        # arrays — the differentiable-input batch is shard-local)
        for qi, ct, e_l, p_l in zip(qinfos, ctabs, esv_c, props_c):
            qi["_coup_tabs_l"] = ct
            qi["_esv_l"] = e_l
            qi["_props_l"] = p_l

        def shard_index():
            if isinstance(axis, tuple):
                s = jax.lax.axis_index(axis[0])
                for a in axis[1:]:
                    s = s * mesh.shape[a] + jax.lax.axis_index(a)
                return s
            return jax.lax.axis_index(axis)

        # --- per-qmap FIELD-local gather/assembly: banded lane-gather engine
        # when the (sub)domain's plans built (same redundant-full pattern as
        # the general step: every device runs the full banded pass, element
        # work stays sharded); scalar dofmap ops otherwise. Coupling-column
        # and interface gathers stay scalar — they are small next to the
        # diagonal-block gathers that dominate the CG matvec. ---------------
        def make_dof_ops(qi):
            banded = qi["banded"]
            if banded is None:
                return None
            ne_pad, ne_cells = qi["ne_pad"], qi["ne_cells"]
            ndof_el = qi["ndof_el"]
            ne_local = ne_pad // ndev
            nf = sizes[qi["field"]]

            def gather_cells(u_i):
                ue = banded._banded_take("cell", u_i).reshape(
                    ne_cells, ndof_el
                )
                if ne_pad != ne_cells:
                    ue = jnp.concatenate(
                        [ue, jnp.zeros((ne_pad - ne_cells, ndof_el), ue.dtype)]
                    )
                return jax.lax.dynamic_slice_in_dim(
                    ue, (shard_index() * ne_local).astype(jnp.int32), ne_local
                )

            def partial_assemble(vals_e, dtype):
                all_vals = jax.lax.dynamic_update_slice(
                    jnp.zeros((ne_pad, ndof_el), dtype),
                    vals_e.astype(dtype),
                    (
                        (shard_index() * ne_local).astype(jnp.int32),
                        jnp.int32(0),
                    ),
                )
                part = banded._banded_take(
                    "asm", all_vals[:ne_cells].T.reshape(-1)
                ).astype(dtype)
                return part[:nf]

            return (gather_cells, partial_assemble)

        dof_ops = [make_dof_ops(qi) for qi in qinfos]

        def gather_e(i, u_i, dofmap_l):
            ops = dof_ops[i]
            # f64 vectors take the dofmap gather: the banded engine's TPU
            # kernel is f32 (on CPU _banded_take is the exact XLA oracle,
            # but the dtype gate keeps behavior uniform)
            if ops is None or u_i.dtype == jnp.float64:
                return u_i[dofmap_l]
            return ops[0](u_i)

        def scatter_field(y, i, dofmap_l, vals_e):
            """y[off_f + dofmap_l] += vals_e into the MONOLITHIC vector."""
            qi = qinfos[i]
            off = offsets[qi["field"]]
            ops = dof_ops[i]
            if ops is None or y.dtype == jnp.float64:
                return y.at[dofmap_l.ravel() + off].add(vals_e.ravel())
            part = ops[1](vals_e, y.dtype)
            return y.at[off : off + sizes[qi["field"]]].add(part)

        def eval_coup_vals(qi, tabs, parts):
            """Coupled-ESV values (npts_l, size) per coupling of this qmap."""
            out = []
            for c, (cdN_l, cxq_l, cdm_l, _ccd) in zip(qi["my_coups"], tabs):
                col_u = parts[c["col"]]
                cue = col_u[cdm_l]
                cnl, cnc = c["col_dom"].nloc, c["col_dom"].ncomp
                Ncol = c["col_dom"].N
                x_expr = c["x_expr_fn"]

                def ce(ue, d, x):
                    un = ue.reshape(cnl, cnc)
                    u_q = Ncol @ un
                    g_q = jnp.einsum("qvi,vc->qci", d, un)
                    return jax.vmap(
                        lambda u_, g_, x_: x_expr(Ctx(u_, g_, x_))
                    )(u_q, g_q, x)

                g = jax.vmap(ce)(cue, cdN_l, cxq_l)
                out.append(g.reshape(g.shape[0] * qi["nq"], -1))
            return out

        def itf_residual(parts, dtype):
            """Interface contributions as a full (ndofs,) partial vector."""
            R = jnp.zeros(ndofs, dtype)
            for ii, info in zip(blocked.interfaces, itf_infos):
                w_l, d1_l, d2_l = info["_tabs_l"][:3]
                nlc = info["nloc_f"] * info["ncomp"]
                u1 = parts[info["i"]][d1_l]  # (nf_l, nloc_f*nc)
                u2 = parts[info["j"]][d2_l]
                nq_f, nc = info["nq"], info["ncomp"]
                Nf = info["N"]

                def jump_q(a, b):
                    an = a.reshape(-1, info["nloc_f"], nc)
                    bn = b.reshape(-1, info["nloc_f"], nc)
                    return jnp.einsum("qv,fvc->fqc", Nf, bn - an)

                t_q = jax.vmap(jax.vmap(info["traction"]))(jump_q(u1, u2))
                wt = w_l[:, :, None] * t_q
                contrib = (
                    jnp.einsum("qv,fqc->fvc", Nf, wt)
                    .reshape(-1, nlc)
                    .astype(dtype)
                )
                R = R.at[
                    (d1_l + offsets[info["i"]]).ravel()
                ].add(-contrib.ravel())
                R = R.at[
                    (d2_l + offsets[info["j"]]).ravel()
                ].add(contrib.ravel())
            return R

        def itf_matrices(parts):
            out = []
            for info in itf_infos:
                w_l, d1_l, d2_l = info["_tabs_l"][:3]
                nc = info["ncomp"]
                Nf = info["N"]
                u1 = parts[info["i"]][d1_l]
                u2 = parts[info["j"]][d2_l]

                def jump_q(a, b):
                    an = a.reshape(-1, info["nloc_f"], nc)
                    bn = b.reshape(-1, info["nloc_f"], nc)
                    return jnp.einsum("qv,fvc->fqc", Nf, bn - an)

                D = jax.vmap(jax.vmap(jax.jacfwd(info["traction"])))(
                    jump_q(u1, u2)
                )
                base = jnp.einsum("fq,qv,qw,fqce->fvcwe", w_l, Nf, Nf, D)
                k = info["nloc_f"] * nc
                out.append(
                    base.reshape(base.shape[0], k, k).astype(parts[0].dtype)
                )
            return out

        def evaluate(z_):
            parts = split(z_)
            R_part = jnp.zeros(ndofs, z_.dtype)
            diag_Ks, coup_Ks, new_states = [], [], []
            for i, (qi, lk, tabs, ct, st_l) in enumerate(zip(
                qinfos, locals_, qtabs, ctabs, states
            )):
                dNdx_l, wdetJ_l, x_q_l, dofmap_l = tabs
                u_i = parts[qi["field"]]
                u_e = gather_e(i, u_i, dofmap_l)
                coup_vals = eval_coup_vals(qi, ct, parts)
                x = lk["point_inputs"](u_e, dNdx_l, x_q_l, coup_vals)
                flux, Ct, st_new = lk["integrate"](x, st_l, qi["_props_l"], dt)
                fields_e = lk["fields_from"](flux, st_new, u_e.shape[0])
                r_e = lk["residual_cells"](u_e, dNdx_l, wdetJ_l, x_q_l, fields_e)
                K_e = lk["diag_matrices"](
                    u_e, dNdx_l, wdetJ_l, x_q_l, fields_e, Ct
                )
                coup_cols = [
                    (parts[c["col"]][cdm_l],)
                    for c, (_, _, cdm_l, _) in zip(qi["my_coups"], ct)
                ]
                Krc = lk["coupling_matrices"](
                    u_e, dNdx_l, wdetJ_l, x_q_l, Ct, coup_cols
                )
                # material laws may bake f64 jnp constants (traced under
                # x64): pin element tangents/residuals back to the solve
                # dtype so scatters and the coarse build stay single-dtype
                R_part = scatter_field(R_part, i, dofmap_l, r_e.astype(z_.dtype))
                diag_Ks.append(K_e.astype(z_.dtype))
                coup_Ks.append([K.astype(z_.dtype) for K in Krc])
                new_states.append(st_new)
            R_part = R_part + itf_residual(parts, z_.dtype)
            R = jax.lax.psum(R_part, axis)
            R = jnp.where(bc_mask, 0.0, R)
            return R, diag_Ks, coup_Ks, itf_matrices(parts), new_states

        def residual_norm(z_):
            parts = split(z_)
            R_part = jnp.zeros(ndofs, z_.dtype)
            for i, (qi, lk, tabs, ct, st_l) in enumerate(zip(
                qinfos, locals_, qtabs, ctabs, states
            )):
                dNdx_l, wdetJ_l, x_q_l, dofmap_l = tabs
                u_e = gather_e(i, parts[qi["field"]], dofmap_l)
                coup_vals = eval_coup_vals(qi, ct, parts)
                x = lk["point_inputs"](u_e, dNdx_l, x_q_l, coup_vals)
                flux, st_new = lk["flux"](x, st_l, qi["_props_l"], dt)
                fields_e = lk["fields_from"](flux, st_new, u_e.shape[0])
                r_e = lk["residual_cells"](u_e, dNdx_l, wdetJ_l, x_q_l, fields_e)
                R_part = scatter_field(R_part, i, dofmap_l, r_e.astype(z_.dtype))
            R_part = R_part + itf_residual(parts, z_.dtype)
            R = jax.lax.psum(R_part, axis)
            return norm(jnp.where(bc_mask, 0.0, R))

        def build_coarse(dK, cK, iK):
            """Monolithic coarse operator P^T K P over the per-field
            coordinate-box aggregates: diagonal blocks + cross-field coupling
            blocks (at their row/col coarse offsets) + interface blocks,
            Dirichlet rows/cols zeroed — dense inverse, frozen per step."""
            dtype = z.dtype
            w = 1.0 - bc_mask.astype(dtype)
            Ac = jnp.zeros(ncoarse * ncoarse, dtype)
            for qi, tabs, cd_l, ct, K_e, Krc in zip(
                qinfos, qtabs, qcdofs, ctabs, dK, cK
            ):
                dofmap_l = tabs[3]
                w_r = w[dofmap_l + offsets[qi["field"]]]
                Kw = K_e * w_r[:, :, None] * w_r[:, None, :]
                idx = (cd_l[:, :, None] * ncoarse + cd_l[:, None, :]).ravel()
                Ac = Ac.at[idx].add(Kw.ravel())
                for c, (_, _, cdm_l, ccd_l), K in zip(
                    qi["my_coups"], ct, Krc
                ):
                    w_c = w[cdm_l + offsets[c["col"]]]
                    Kc = K * w_r[:, :, None] * w_c[:, None, :]
                    idx = (
                        cd_l[:, :, None] * ncoarse + ccd_l[:, None, :]
                    ).ravel()
                    Ac = Ac.at[idx].add(Kc.ravel())
            for info, base in zip(itf_infos, iK):
                _, d1_l, d2_l, cd1_l, cd2_l = info["_tabs_l"]
                w1 = w[d1_l + offsets[info["i"]]]
                w2 = w[d2_l + offsets[info["j"]]]
                for cda, cdb, wa, wb, sgn in (
                    (cd1_l, cd1_l, w1, w1, 1.0),
                    (cd2_l, cd2_l, w2, w2, 1.0),
                    (cd1_l, cd2_l, w1, w2, -1.0),
                    (cd2_l, cd1_l, w2, w1, -1.0),
                ):
                    Bw = sgn * base * wa[:, :, None] * wb[:, None, :]
                    idx = (
                        cda[:, :, None] * ncoarse + cdb[:, None, :]
                    ).ravel()
                    Ac = Ac.at[idx].add(Bw.ravel())
            Ac = jax.lax.psum(Ac, axis).reshape(ncoarse, ncoarse)
            dAc = jnp.diagonal(Ac)
            ridge = 1e-8 * jnp.max(jnp.abs(dAc)) + 1e-30
            Ac = Ac + (
                ridge + jnp.where(jnp.abs(dAc) < ridge, 1.0, 0.0)
            ) * jnp.eye(ncoarse, dtype=dtype)
            return jnp.linalg.inv(Ac)

        if two_level:
            def make_coarse_correct(Ac_inv):
                def coarse_correct(r):
                    r0 = jnp.where(bc_mask, 0.0, r)
                    rc = jax.ops.segment_sum(
                        r0, cdof_ids, num_segments=ncoarse
                    )
                    wc = Ac_inv @ rc
                    return jnp.where(bc_mask, 0.0, wc[cdof_ids])

                return coarse_correct
        else:
            def make_coarse_correct(_):
                return jnp.zeros_like

        def newton_update(z, R, diag_Ks, coup_Ks, itf_Ks, res_norm):
            # scalar diagonal incl. interface diagonal entries
            diag = jnp.zeros(ndofs, z.dtype)
            for qi, tabs, K_e in zip(qinfos, qtabs, diag_Ks):
                dofmap_l = tabs[3]
                diag = diag.at[
                    dofmap_l.ravel() + offsets[qi["field"]]
                ].add(jnp.diagonal(K_e, axis1=1, axis2=2).ravel())
            for info, base in zip(itf_infos, itf_Ks):
                _, d1_l, d2_l = info["_tabs_l"][:3]
                db = jnp.diagonal(base, axis1=1, axis2=2)
                diag = diag.at[(d1_l + offsets[info["i"]]).ravel()].add(db.ravel())
                diag = diag.at[(d2_l + offsets[info["j"]]).ravel()].add(db.ravel())
            diag = jax.lax.psum(diag, axis)
            diag = jnp.where(bc_mask | (jnp.abs(diag) < 1e-30), 1.0, diag)

            if use_block_smoother:
                # per-field node-block Jacobi: a (ncomp, ncomp) block per
                # node of each VECTOR field (scalar fields keep the plain
                # diagonal) — same scheme as the general step's smoother,
                # plus the interface node-diagonal blocks
                binvs = {}
                for fi in range(nfields):
                    ncf = field_ncomp[fi]
                    if ncf <= 1:
                        continue
                    cols = []
                    for b in range(ncf):
                        col = jnp.zeros(ndofs, z.dtype)
                        for qi, tabs, K_e in zip(qinfos, qtabs, diag_Ks):
                            if qi["field"] != fi:
                                continue
                            dofmap_l = tabs[3]
                            jj = _np.arange(K_e.shape[1])
                            node_col0 = jnp.asarray(
                                ((jj // ncf) * ncf).astype(_np.int32)
                            )
                            col = col.at[
                                dofmap_l.ravel() + offsets[fi]
                            ].add(K_e[:, jj, node_col0 + b].ravel())
                        for info, base in zip(itf_infos, itf_Ks):
                            if info["ncomp"] != ncf:
                                continue
                            _, d1_l, d2_l = info["_tabs_l"][:3]
                            nb = jnp.einsum(
                                "fvavc->fvac",
                                base.reshape(
                                    base.shape[0],
                                    info["nloc_f"],
                                    ncf,
                                    info["nloc_f"],
                                    ncf,
                                ),
                            )[..., b]
                            flat = nb.reshape(base.shape[0], -1).ravel()
                            if info["i"] == fi:
                                col = col.at[
                                    (d1_l + offsets[fi]).ravel()
                                ].add(flat)
                            if info["j"] == fi:
                                col = col.at[
                                    (d2_l + offsets[fi]).ravel()
                                ].add(flat)
                        cols.append(col)
                    seg = jax.lax.psum(jnp.stack(cols, -1), axis)[
                        offsets[fi] : offsets[fi] + sizes[fi]
                    ]
                    Bm = seg.reshape(-1, ncf, ncf)
                    mb = (
                        bc_mask[offsets[fi] : offsets[fi] + sizes[fi]]
                        .reshape(-1, ncf)
                        .astype(z.dtype)
                    )
                    keep = 1.0 - mb
                    Bm = Bm * keep[:, :, None] * keep[:, None, :]
                    eye = jnp.eye(ncf, dtype=z.dtype)
                    Bm = Bm + eye * mb[:, :, None]
                    tr = jnp.einsum("naa->n", jnp.abs(Bm))
                    Bm = Bm + eye * jnp.where(
                        tr < 1e-30, 1.0, 1e-14 * tr
                    )[:, None, None]
                    binvs[fi] = _sym_block_inv(Bm, eye)

                diag_parts = split(diag)

                def smooth(r):
                    parts_r = split(r)
                    out = []
                    for fi in range(nfields):
                        if fi in binvs:
                            out.append(
                                jnp.einsum(
                                    "nab,nb->na",
                                    binvs[fi],
                                    parts_r[fi].reshape(
                                        -1, field_ncomp[fi]
                                    ),
                                ).reshape(-1)
                            )
                        else:
                            out.append(parts_r[fi] / diag_parts[fi])
                    return jnp.concatenate(out)

            else:
                def smooth(r):
                    return r / diag

            def Av(v):
                v0 = jnp.where(bc_mask, 0.0, v)
                parts_v = split(v0)
                y = jnp.zeros(ndofs, v.dtype)
                for i, (qi, tabs, ct, K_e, Krc) in enumerate(zip(
                    qinfos, qtabs, ctabs, diag_Ks, coup_Ks
                )):
                    dofmap_l = tabs[3]
                    y_e = jnp.einsum(
                        "eij,ej->ei", K_e,
                        gather_e(i, parts_v[qi["field"]], dofmap_l),
                    )
                    for c, (_, _, cdm_l, _), K in zip(
                        qi["my_coups"], ct, Krc
                    ):
                        vc = parts_v[c["col"]][cdm_l]
                        y_e = y_e + jnp.einsum("eij,ej->ei", K, vc)
                    y = scatter_field(y, i, dofmap_l, y_e)
                for info, base in zip(itf_infos, itf_Ks):
                    _, d1_l, d2_l = info["_tabs_l"][:3]
                    o_i, o_j = offsets[info["i"]], offsets[info["j"]]
                    v1 = parts_v[info["i"]][d1_l]
                    v2 = parts_v[info["j"]][d2_l]
                    y = y.at[(d1_l + o_i).ravel()].add(
                        (jnp.einsum("fab,fb->fa", base, v1)
                         - jnp.einsum("fab,fb->fa", base, v2)).ravel()
                    )
                    y = y.at[(d2_l + o_j).ravel()].add(
                        (jnp.einsum("fab,fb->fa", base, v2)
                         - jnp.einsum("fab,fb->fa", base, v1)).ravel()
                    )
                y = jax.lax.psum(y, axis)
                return jnp.where(bc_mask, v, y)

            b = jnp.where(bc_mask, 0.0, -R)
            # BiCGStab, not CG: the blocked operator is NONSYMMETRIC (the
            # cross-field coupling blocks are not each other's transposes) —
            # same reason the host BlockedNonlinearProblem defaults to
            # bicgstab (solvers.py). Hand-rolled while_loop, NOT
            # jax.scipy.sparse.linalg.bicgstab: that wrapper's
            # custom_linear_solve transposes the matvec jaxpr, which the
            # banded Pallas gathers don't support on TPU. Preconditioner =
            # per-field smoother + frozen two-level coarse correction; n_cg
            # is a budget (cg_rtol early-exit).
            du = _pbicgstab(
                Av, b, lambda v: smooth(v) + coarse_correct(v),
                maxiter=n_cg, tol=cg_rtol,
            )
            du = jnp.where(jnp.isfinite(du), du, 0.0)

            def ls_cond(cst):
                alpha, n_try, k = cst
                bad = jnp.logical_or(
                    ~jnp.isfinite(n_try), n_try >= (1 - 1e-4 * alpha) * res_norm
                )
                return jnp.logical_and(bad, k < n_backtracks)

            def ls_body(cst):
                alpha, _, k = cst
                alpha = alpha * 0.5
                return (alpha, residual_norm(z + alpha * du), k + 1)

            n1 = residual_norm(z + du)
            alpha, n_fin, _ = jax.lax.while_loop(ls_cond, ls_body, (1.0, n1, 0))
            take = jnp.isfinite(n_fin) & (n_fin < res_norm)
            return jnp.where(take, z + alpha * du, z)

        # stash interface sharded tables
        for info, tabs in zip(itf_infos, itabs):
            info["_tabs_l"] = tabs

        R, dK, cK, iK, st_out = evaluate(z)
        res = norm(R)
        res0 = jnp.maximum(res, 1e-30)
        # frozen coarse factor from the SAME entering tangents the first
        # Newton update uses (late-bound name referenced by newton_update)
        coarse_correct = make_coarse_correct(
            build_coarse(dK, cK, iK) if two_level else None
        )

        def newton_body(carry):
            z, R, dK, cK, iK, sts, res, it = carry
            z_new = newton_update(z, R, dK, cK, iK, res)
            R2, dK2, cK2, iK2, st2 = evaluate(z_new)
            return (z_new, R2, dK2, cK2, iK2, st2, norm(R2), it + 1)

        def newton_cond(carry):
            *_, res_prev, it = carry
            return jnp.logical_and(it < n_newton, res_prev > rtol * res0 + atol)

        z, R, dK, cK, iK, st_out, res_f, _ = jax.lax.while_loop(
            newton_cond, newton_body, (z, R, dK, cK, iK, st_out, res, 0)
        )
        return z, tuple(st_out), res_f

    def step(z, states, bc_mask, bc_vals, dt=0.0):
        states_p = pad_states(states)
        z = jnp.asarray(z)

        def cast(t):
            # tabulated geometry to the solve dtype: keeps element tangents,
            # scatters and the coarse build in ONE dtype (an f32 solve must
            # not silently promote through f64 host-tabulated dNdx/wdetJ)
            a = jnp.asarray(t)
            return a.astype(z.dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a

        z_new, new_states, rn = _step(
            z,
            tuple(jax.tree.map(cast, qi["tables"]) for qi in qinfos),
            tuple(qi["cdof"] for qi in qinfos),
            tuple(jax.tree.map(cast, qi["coup_tabs"]) for qi in qinfos),
            tuple(states_p),
            tuple(jax.tree.map(cast, qi["esv_consts"]) for qi in qinfos),
            tuple(jax.tree.map(cast, qi["props_consts"]) for qi in qinfos),
            tuple(jax.tree.map(cast, info["tables"]) for info in itf_infos),
            jnp.asarray(bc_mask),
            jnp.asarray(bc_vals, z.dtype),
            jnp.asarray(dt, z.dtype),
        )
        return z_new, unpad_states(new_states), rn

    return jax.jit(step), pad_states
