"""Fused sharded Newton step for BLOCKED (monolithic multi-field) problems.

Split out of sharding.py (VERDICT r4 item 3); see
:func:`make_sharded_blocked_step`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .coarse import _coord_agg_cdofs
from .krylov import _pbicgstab, _sym_block_inv
from .sharding import _axis_size, pad_to_multiple

shard_map = jax.shard_map


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
