"""Element-block Schwarz smoother prototypes on the tet-P2 Ogden tangent
(continuation of _pc_proto.py). Temporary experiment driver."""
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
from dolfinx_materials_tpu.fem.element import EDGES

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8

t0 = time.perf_counter()
mat, qmap, V, bcs, bc_top = mod.build(N, "tetrahedron", 2)
prob = NonlinearMaterialProblem(qmap, Function(V), bcs=bcs)
ndofs = V.num_dofs
u = jnp.zeros(ndofs)
prob._constitutive_update(u)
Kels = prob._element_matrices(u)
K_e = np.asarray(Kels[0], np.float64)  # (ne, 90, 90)
K = qmap.domain.to_scipy_csr(K_e, ndofs).tocsr()
mask, _ = combine_bcs(bcs, ndofs)
mask = np.asarray(mask).astype(bool)
free = ~mask
D = sp.diags(free.astype(np.float64))
K = (D @ K @ D + sp.diags(mask.astype(np.float64))).tocsr()
print(f"K: {ndofs} dofs, nnz={K.nnz} [{time.perf_counter()-t0:.0f}s]",
      flush=True)

dofmap = np.asarray(qmap.domain.dofmap)  # (ne, 90)
ne, ndl = dofmap.shape
rng = np.random.default_rng(0)
b = rng.standard_normal(ndofs)
b[mask] = 0.0

ncomp, nnodes = 3, ndofs // 3


def node_block_inv():
    Kd = K.tocoo()
    sel = (Kd.row // ncomp) == (Kd.col // ncomp)
    B = np.zeros((nnodes, ncomp, ncomp))
    np.add.at(B, (Kd.row[sel] // ncomp, Kd.row[sel] % ncomp,
                  Kd.col[sel] % ncomp), Kd.data[sel])
    return np.linalg.inv(B)


Binv = node_block_inv()


def bjac(r):
    return np.einsum("nij,nj->ni", Binv, r.reshape(nnodes, ncomp)).ravel()


# ---- element-block Schwarz --------------------------------------------------
count = np.zeros(ndofs)
np.add.at(count, dofmap.ravel(), 1.0)
pou = 1.0 / count  # partition of unity per dof

# variant (a): ASSEMBLED submatrix per element (gold standard, not
# matrix-free-friendly)
t1 = time.perf_counter()
sub = np.empty((ne, ndl, ndl))
for e in range(ne):
    sub[e] = K[dofmap[e]][:, dofmap[e]].toarray()
sub_inv = np.linalg.inv(sub + 1e-12 * np.eye(ndl))
print(f"assembled submatrices [{time.perf_counter()-t1:.0f}s]", flush=True)

# variant (b): element matrix completed by the missing assembled diagonal
# (matrix-free friendly: needs only K_e and the assembled diagonal)
dK = np.asarray(K.diagonal())
w_l = np.where(mask[dofmap], 0.0, 1.0)
K_ebc = K_e * w_l[:, :, None] * w_l[:, None, :]
d_el = np.einsum("eii->ei", K_ebc)
comp = dK[dofmap] - d_el  # missing assembled diagonal per local dof
K_comp = K_ebc + np.einsum("ei,ij->eij", comp + mask[dofmap], np.eye(ndl))
comp_inv = np.linalg.inv(K_comp + 1e-9 * np.eye(ndl))


def eas(r, inv):
    rl = r[dofmap]  # (ne, ndl)
    zl = np.einsum("eij,ej->ei", inv, rl)
    z = np.zeros(ndofs)
    np.add.at(z, dofmap.ravel(), (zl * pou[dofmap]).ravel())
    return np.where(mask, 0.0, z)


def eas_sym(r, inv):
    """PoU on both sides -> symmetric smoother"""
    w = np.sqrt(pou)
    rl = (r * w)[dofmap]
    zl = np.einsum("eij,ej->ei", inv, rl)
    z = np.zeros(ndofs)
    np.add.at(z, dofmap.ravel(), (zl * w[dofmap]).ravel())
    return np.where(mask, 0.0, z)


# ---- P1 coarse --------------------------------------------------------------
def make_p1():
    mesh = V.mesh
    nv = mesh.num_vertices
    edge_verts, _ = mesh.edges()
    nn = V.num_nodes
    parents = np.empty((nn, 2), np.int64)
    parents[:nv] = np.arange(nv)[:, None]
    parents[nv:] = edge_verts
    pwt = np.zeros((nn, 2))
    pwt[:nv, 0] = 1.0
    pwt[nv:] = 0.5
    renum = V.node_renum
    if renum is not None:
        p2, w2 = np.empty_like(parents), np.empty_like(pwt)
        p2[renum], w2[renum] = parents, pwt
        parents, pwt = p2, w2
    rows = np.repeat(np.arange(nn) * ncomp, 2 * ncomp)
    rows = (np.arange(nn)[:, None, None] * ncomp
            + np.arange(ncomp)[None, None, :])  # (nn, 1, ncomp)
    rows = np.broadcast_to(rows, (nn, 2, ncomp)).ravel()
    cols = (parents[:, :, None] * ncomp + np.arange(ncomp)[None, None, :]).ravel()
    vals = np.broadcast_to(pwt[:, :, None], (nn, 2, ncomp)).ravel()
    P = sp.csr_matrix((vals, (rows, cols)), shape=(ndofs, nv * ncomp))
    return sp.diags(free.astype(np.float64)) @ P


P1 = make_p1()
Ac = (P1.T @ K @ P1).tocsc()
d = np.abs(Ac.diagonal())
ridge = 1e-10 * d.max() + 1e-30
Ac = Ac + sp.diags(ridge + (d < ridge).astype(np.float64))
lu = spla.splu(Ac)
cs1 = lu.solve


def pcg(Mfun, label, cost=1.0, tol=1e-3, maxit=400):
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
        if rn < 1e-6:
            break
        z = Mfun(r)
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
    print(f"{label:46s} its(1e-3)={its:4d}  its(1e-6)={hit6 or '>400':>4}  "
          f"eff(1e-3)={its*cost:.0f} mv", flush=True)
    return its


for om in (1.0, 0.5):
    pcg(lambda r, om=om: om * eas_sym(r, sub_inv) + P1 @ cs1(P1.T @ r),
        f"additive {om}*eAS(assembled,sym) + P1", cost=2.0)
for om in (1.0, 0.5):
    pcg(lambda r, om=om: om * eas_sym(r, comp_inv) + P1 @ cs1(P1.T @ r),
        f"additive {om}*eAS(elem+diag,sym) + P1", cost=2.0)


def v11(r, inv, om):
    z = om * eas_sym(r, inv)
    z = z + P1 @ cs1(P1.T @ (r - K @ z))
    z = z + om * eas_sym(r - K @ z, inv)
    return z


for om in (1.0, 0.5):
    pcg(lambda r, om=om: v11(r, sub_inv, om),
        f"V(1,1) {om}*eAS(assembled) + P1", cost=4.0)
    pcg(lambda r, om=om: v11(r, comp_inv, om),
        f"V(1,1) {om}*eAS(elem+diag) + P1", cost=4.0)


def v01(r, inv, om):
    """coarse then one post-smooth (nonsym, 1 extra mv)"""
    z = P1 @ cs1(P1.T @ r)
    z = z + om * eas_sym(r - K @ z, inv)
    return z


pcg(lambda r: v01(r, comp_inv, 1.0), "coarse+post-eAS(elem+diag)", cost=3.0)

# chebyshev(3) on bjac-preconditioned operator + additive P1
lam = 0.0
v = rng.standard_normal(ndofs)
for _ in range(20):
    v = bjac(K @ v)
    lam = np.linalg.norm(v)
    v /= lam
print(f"lambda_max(bjac K) ~ {lam:.2f}", flush=True)


def cheb(r, k=3, lmax=None, lmin_frac=0.06):
    lmax = lmax or 1.1 * lam
    lmin = lmin_frac * lmax
    th, de = 0.5 * (lmax + lmin), 0.5 * (lmax - lmin)
    x = np.zeros(ndofs)
    rr = r.copy()
    sig = th / de
    rho = 1.0 / sig
    d = bjac(rr) / th
    x = x + d
    for _ in range(k - 1):
        rr = r - K @ x
        rho_new = 1.0 / (2 * sig - rho)
        d = rho_new * rho * d + 2 * rho_new / de * bjac(rr)
        x = x + d
        rho = rho_new
    return x


pcg(lambda r: cheb(r) + P1 @ cs1(P1.T @ r), "additive cheb3(bjac) + P1",
    cost=3.0)


def v_cheb(r):
    z = cheb(r, 2)
    z = z + P1 @ cs1(P1.T @ (r - K @ z))
    z = z + cheb(r - K @ z, 2)
    return z


pcg(v_cheb, "V(cheb2,cheb2) + P1", cost=6.0)
print(f"total {time.perf_counter()-t0:.0f}s", flush=True)
