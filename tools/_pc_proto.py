"""Offline preconditioner prototyping for the tet-P2 Ogden tangent
(VERDICT r4 directive 2). Builds the N=8 problem on CPU/f64, host-solves a
few load steps, extracts the exact element tangents, and measures PCG
iteration counts for candidate preconditioners WITHOUT paying TPU compiles.
Temporary experiment driver."""
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import importlib.util as ilu

spec = ilu.spec_from_file_location("ogden_demo", "demos/ogden_block_tpu.py")
mod = ilu.module_from_spec(spec)
spec.loader.exec_module(mod)

from dolfinx_materials_tpu import NonlinearMaterialProblem
from dolfinx_materials_tpu.fem import Function
from dolfinx_materials_tpu.fem.bc import combine_bcs
from dolfinx_materials_tpu.parallel.sharding import _coord_agg_modes

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
EZ = float(sys.argv[2]) if len(sys.argv) > 2 else 0.08

t0 = time.perf_counter()
mat, qmap, V, bcs, bc_top = mod.build(N, "tetrahedron", 2)
prob = NonlinearMaterialProblem(
    qmap, Function(V), bcs=bcs,
    options={"ksp_type": "lu", "rtol": 1e-10, "max_it": 30},
)
nsteps = max(0, round(EZ / 0.02))
for ez in np.linspace(0, EZ, nsteps + 1)[1:]:
    bc_top.set(-float(ez))
    conv, its = prob.solve()
    print(f"host step ez={ez:.2f}: conv={conv} in {its} its "
          f"[{time.perf_counter()-t0:.0f}s]", flush=True)
    assert conv

ndofs = V.num_dofs
u = jnp.asarray(prob.u.x)
prob._constitutive_update(u)
Kels = prob._element_matrices(u)
K = qmap.domain.to_scipy_csr(np.asarray(Kels[0]), ndofs).tocsr()
mask, _ = combine_bcs(bcs, ndofs)
mask = np.asarray(mask).astype(bool)
free = ~mask
# symmetric BC elimination: identity rows/cols on constrained dofs
D = sp.diags(free.astype(np.float64))
K = D @ K @ D + sp.diags(mask.astype(np.float64))
K = K.tocsr()
print(f"K: {ndofs} dofs, nnz={K.nnz} [{time.perf_counter()-t0:.0f}s]",
      flush=True)

rng = np.random.default_rng(0)
b = rng.standard_normal(ndofs)
b[mask] = 0.0

ncomp = 3
nnodes = ndofs // ncomp


def node_block_inv(K):
    """3x3 node-diagonal block inverse (the device smoother)."""
    Kd = K.tocoo()
    sel = (Kd.row // ncomp) == (Kd.col // ncomp)
    B = np.zeros((nnodes, ncomp, ncomp))
    np.add.at(B, (Kd.row[sel] // ncomp, Kd.row[sel] % ncomp,
                  Kd.col[sel] % ncomp), Kd.data[sel])
    return np.linalg.inv(B)


Binv = node_block_inv(K)


def smooth(r):
    return np.einsum("nij,nj->ni", Binv, r.reshape(nnodes, ncomp)).ravel()


def jac_diag():
    d = K.diagonal().copy()
    d[d == 0] = 1.0
    return 1.0 / d


dinv = jac_diag()


def make_box_coarse(boxes, modes, budget=3072):
    ncoarse, agg, W = _coord_agg_modes(
        V, boxes, budget=budget, modes=modes
    )
    nmodes = W.shape[2]
    rows, cols, vals = [], [], []
    for c in range(ncomp):
        for m in range(nmodes):
            w = W[:, c, m]
            nz = np.nonzero(w)[0]
            rows.append(nz * ncomp + c)
            cols.append(agg[nz] * nmodes + m)
            vals.append(w[nz].astype(np.float64))
    P = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(ndofs, ncoarse),
    )
    # zero BC rows of P (device build uses raw tangents; prototype matches
    # the eliminated operator)
    P = sp.diags(free.astype(np.float64)) @ P
    return P


def make_p1_coarse():
    """Geometric P2 -> P1 interpolation: vertex nodes map to themselves,
    edge nodes to the average of their two edge vertices."""
    coords = np.asarray(V.node_coords)
    mesh = V.mesh
    pts = np.asarray(mesh.points)
    edge_verts, _ = mesh.edges()
    key = lambda X: np.round(X * 1e9).astype(np.int64)

    def hkey(X):
        k = key(X)
        return k[:, 0] * (10**12) + k[:, 1] * (10**6) + k[:, 2]

    node_of = {h: i for i, h in enumerate(hkey(coords))}
    vert_node = np.array([node_of[h] for h in hkey(pts)])  # vertex -> P2 node
    mid = 0.5 * (pts[edge_verts[:, 0]] + pts[edge_verts[:, 1]])
    edge_node = np.array([node_of[h] for h in hkey(mid)])
    nverts = len(pts)
    # coarse dof c = vertex v, comp c
    rows, cols, vals = [], [], []
    for c in range(ncomp):
        rows.append(vert_node * ncomp + c)
        cols.append(np.arange(nverts) * ncomp + c)
        vals.append(np.ones(nverts))
        for s in range(2):
            rows.append(edge_node * ncomp + c)
            cols.append(edge_verts[:, s] * ncomp + c)
            vals.append(np.full(len(edge_verts), 0.5))
    P = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(ndofs, nverts * ncomp),
    )
    P = sp.diags(free.astype(np.float64)) @ P
    return P


def coarse_solver(P, dense=False):
    Ac = (P.T @ K @ P).tocsc()
    # regularize empty/near-null coarse dofs (fully-constrained aggregates,
    # zero rotation modes of tiny aggregates)
    d = np.abs(Ac.diagonal())
    ridge = 1e-10 * d.max() + 1e-30
    Ac = Ac + sp.diags(ridge + (d < ridge).astype(np.float64))
    if dense:
        Aci = np.linalg.inv(Ac.toarray())
        return lambda rc: Aci @ rc
    try:
        lu = spla.splu(Ac)
        return lu.solve
    except RuntimeError:
        Aci = np.linalg.pinv(Ac.toarray())
        return lambda rc: Aci @ rc


def pcg(Mfun, label, cost_matvecs=1.0, tol=1e-3, maxit=400):
    x = np.zeros(ndofs)
    r = b.copy()
    z = Mfun(r)
    p = z.copy()
    rz = r @ z
    nb = np.linalg.norm(b)
    its = maxit
    hit6 = None
    for k in range(maxit):
        Kp = K @ p
        alpha = rz / (p @ Kp)
        x += alpha * p
        r -= alpha * Kp
        rn = np.linalg.norm(r) / nb
        if hit6 is None and rn < 1e-6:
            hit6 = k + 1
        if rn < tol and its == maxit:
            its = k + 1
            if hit6 is not None:
                break
        if rn < 1e-6:
            break
        z = Mfun(r)
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
    eff = its * cost_matvecs
    print(f"{label:42s} its(1e-3)={its:4d}  its(1e-6)={hit6 or '>400':>4}  "
          f"eff-cost(1e-3)={eff:.0f} matvecs", flush=True)
    return its


# ---- candidates -------------------------------------------------------------
if "--baselines" in sys.argv:
    pcg(lambda r: dinv * r, "jacobi")
    pcg(smooth, "node-block jacobi")

if "--boxes" in sys.argv:
    for boxes, modes, budget in ((8, "rbm", 3072),
                                 (12, "rbm", 8192), (16, "trans", 16384)):
        P = make_box_coarse(boxes, modes, budget)
        cs = coarse_solver(P)
        pcg(lambda r: smooth(r) + P @ cs(P.T @ r),
            f"additive bjac + box({boxes},{modes},nc={P.shape[1]})")

P1 = make_p1_coarse()
cs1 = coarse_solver(P1)
pcg(lambda r: smooth(r) + P1 @ cs1(P1.T @ r),
    f"additive bjac + P1 geometric (nc={P1.shape[1]})")

for om in (0.5, 0.7, 1.0):
    def mult_p1(r, om=om):
        z = om * smooth(r)
        z = z + P1 @ cs1(P1.T @ (r - K @ z))
        z = z + om * smooth(r - K @ z)
        return z

    pcg(mult_p1, f"V(1,1) {om}*bjac + P1 geometric", cost_matvecs=3.0)

# P1 coarse + 2 chebyshev-ish damped-jacobi smooths, additive-free hybrid
P = make_box_coarse(8, "rbm", 3072)
cs = coarse_solver(P)
for om in (0.5, 0.7):
    def mult_box(r, om=om):
        z = om * smooth(r)
        z = z + P @ cs(P.T @ (r - K @ z))
        z = z + om * smooth(r - K @ z)
        return z

    pcg(mult_box, f"V(1,1) {om}*bjac + box(8,rbm)", cost_matvecs=3.0)
print(f"total {time.perf_counter()-t0:.0f}s", flush=True)
