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


# Shared helpers live in krylov.py / coarse.py; the blocked monolithic step
# in blocked.py (VERDICT r4 item 3 split). Re-exported here for back-compat.
from .coarse import _coord_agg_cdofs, _coord_agg_modes, _p1_coarse  # noqa: F401,E402
from .krylov import _norm2, _pbicgstab, _sym_block_inv  # noqa: F401,E402

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
    """Fully-fused, sharded Newton load step for a SINGLE-MATERIAL mechanics
    problem (one registered gradient, flux.dgrad residual) — since round 5 a
    thin configuration of :func:`make_sharded_newton_step_general` (VERDICT r4
    item 3: the specialized builder duplicated the general one's gather /
    assembly / CG / line-search machinery; A/B on the benched 64x64 J2 plate
    showed the general step matching its solution to 5e-7 at LOWER wall time,
    tools/_ab_consolidation.py).

    Returns ``step(u, internal_state, bc_mask, bc_vals, dt) ->
    (u_new, new_internal_state (trimmed to real points), res_norm)`` —
    jittable, runs entirely on device, cells sharded over ``mesh``; plus the
    single-state ``pad_state``. ``axis`` may be a tuple of mesh axes (e.g.
    ``("dcn", "ici")``) for hierarchical multi-host collectives, and
    ``shard_dofs=True`` shards the dof vectors (u, R, CG workspace) over the
    same axis. See the general builder's docstring for the solver-loop,
    preconditioner and sharding semantics (identical by construction);
    capability contract mirrors reference solvers.py:31-96 +
    quadrature_map.py:297-334.
    """
    terms = getattr(problem, "_terms", None)
    if not terms or len(terms) != 1 or terms[0]["qmap"] is not qmap:
        raise ValueError(
            "make_sharded_newton_step expects `problem` built on exactly the "
            "given single `qmap`; use make_sharded_newton_step_general for "
            "multi-material / multi-term problems"
        )
    gstep, pad_states = make_sharded_newton_step_general(
        problem,
        mesh,
        axis=axis,
        n_newton=n_newton,
        n_cg=n_cg,
        n_backtracks=n_backtracks,
        rtol=rtol,
        atol=atol,
        shard_dofs=shard_dofs,
        cg_rtol=cg_rtol,
        use_stencil=use_stencil,
        use_banded=use_banded,
        pc=pc,
        pc_boxes=pc_boxes,
        smoother=smoother,
    )

    def pad_state(state):
        return pad_states([state])[0]

    def step(u, internal_state, bc_mask, bc_vals, dt=0.0):
        u_new, new_states, res_norm = gstep(
            u, [internal_state], bc_mask, bc_vals, dt
        )
        return u_new, new_states[0], res_norm

    return step, pad_state


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
    use_stencil=True,
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
      the structured-stencil shifted slices when the qmap covers a full
      structured grid (``QuadratureDomain._stencil``, dtype-agnostic), else
      the banded lane-gather engine whenever the (sub)domain's plans built
      (``QuadratureDomain._banded`` — the same redundant-full pattern as the
      specialized step: every device runs the full stencil/banded pass at
      memory speed, per-element work stays sharded); otherwise scalar dofmap
      gathers. ``use_stencil=False`` / ``use_banded=False`` force the
      fallbacks.

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
                # structured-stencil fast path: only when the qmap covers
                # the FULL structured grid (subset qmaps keep banded/dofmap)
                stencil=(
                    dom._stencil
                    if (
                        use_stencil
                        and getattr(dom, "_stencil", None)
                        and int(_np.prod(dom._stencil)) == dom.ne
                    )
                    else None
                ),
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

        # --- per-qmap gather/assembly: structured-stencil shifted slices on
        # full-mesh structured grids (memory-speed, dtype-agnostic), banded
        # lane-gather engine when the (sub)domain's plans built, scalar
        # dofmap gather/scatter otherwise (the specialized step's
        # redundant-full pattern — every device runs the full stencil/banded
        # pass, element work stays sharded) ---------------------------------
        def make_dof_ops(qi):
            ne_pad, ne_cells = qi["ne_pad"], qi["ne_cells"]
            ndof_el = qi["ndof_el"]
            ne_local = ne_pad // ndev
            stencil = qi["stencil"]
            if stencil is not None:
                dom_q = qi["dom"]
                nloc, ncomp = qi["nloc"], qi["ncomp"]
                corners = (
                    dom_q._CORNERS_2D if len(stencil) == 2
                    else dom_q._CORNERS_3D
                )
                grid_shape = tuple(g + 1 for g in stencil) + (ncomp,)

                def gather_cells(u_full):
                    u2 = u_full[:ndofs].reshape(grid_shape)
                    if len(stencil) == 2:
                        nx, ny = stencil
                        parts = [
                            u2[di : di + nx, dj : dj + ny].reshape(
                                ne_cells, ncomp
                            )
                            for (di, dj) in corners
                        ]
                    else:
                        nx, ny, nz = stencil
                        parts = [
                            u2[
                                di : di + nx, dj : dj + ny, dk : dk + nz
                            ].reshape(ne_cells, ncomp)
                            for (di, dj, dk) in corners
                        ]
                    ue = jnp.concatenate(parts, axis=1)
                    if ne_pad != ne_cells:
                        ue = jnp.concatenate(
                            [ue, jnp.zeros((ne_pad - ne_cells, ndof_el),
                                           ue.dtype)]
                        )
                    return jax.lax.dynamic_slice_in_dim(
                        ue, (shard_index() * ne_local).astype(jnp.int32),
                        ne_local,
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
                    v = all_vals[:ne_cells].reshape(ne_cells, nloc, ncomp)
                    y = jnp.zeros(grid_shape, dtype)
                    if len(stencil) == 2:
                        nx, ny = stencil
                        vv = v.reshape(nx, ny, nloc, ncomp)
                        for k, (di, dj) in enumerate(corners):
                            y = y.at[di : di + nx, dj : dj + ny].add(
                                vv[:, :, k]
                            )
                    else:
                        nx, ny, nz = stencil
                        vv = v.reshape(nx, ny, nz, nloc, ncomp)
                        for k, (di, dj, dk) in enumerate(corners):
                            y = y.at[
                                di : di + nx, dj : dj + ny, dk : dk + nz
                            ].add(vv[:, :, :, k])
                    part = y.reshape(-1)
                    if nd_p != ndofs:
                        part = jnp.concatenate(
                            [part, jnp.zeros(nd_p - ndofs, dtype)]
                        )
                    return part

                return (gather_cells, partial_assemble, True)

            banded = qi["banded"]
            if banded is None:
                return None
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

            return (gather_cells, partial_assemble, False)

        dof_ops = [make_dof_ops(qi) for qi in qinfos]

        def gather_e(i, u_full, dofmap_l):
            ops = dof_ops[i]
            # f64 vectors (the mixed-precision residual path) take the dofmap
            # gather UNLESS the op is dtype-agnostic (stencil slices); the
            # banded engine is a Pallas f32 kernel
            if ops is None or (
                u_full.dtype == jnp.float64 and not ops[2]
            ):
                return u_full[dofmap_l]
            return ops[0](u_full)

        def assemble(i, dofmap_l, vals_e, dtype):
            ops = dof_ops[i]
            if ops is None or (dtype == jnp.float64 and not ops[2]):
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




def make_sharded_blocked_step(*args, **kwargs):
    """See :func:`dolfinx_materials_tpu.parallel.blocked.make_sharded_blocked_step`."""
    from .blocked import make_sharded_blocked_step as _impl

    return _impl(*args, **kwargs)
