"""Feature-major batched 3x3 matrix functions: arrays shaped (3, 3, n).

Why a second layout: under ``vmap`` the per-point matfun ops produce (n, 3, 3)
intermediates whose minor dims (3, 3) land on TPU (sublane, lane) tiles of
(8, 128) -> ~42x HBM padding, which OOMs at production batch sizes. Putting the
POINT axis on the lanes — (3, 3, n) — makes every matrix op nine fused (n,)
vector FMAs with zero padding waste.

Same algorithms as ops/matfun.py (Newton-Schulz square roots, inverse
scaling-squaring log, scaling-squaring exp): matmul/elementwise only, fixed
iteration counts, AD-safe at coincident eigenvalues. Parity with the per-point
path is asserted in tests/test_matfun.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def bmm(A, B):
    """(3,3,n) @ (3,3,n) batched over the trailing axis.

    Unrolled into 27 elementwise FMAs on (n,) vectors — an einsum would lower
    to ``dot_general`` whose canonical batch-first form re-creates (n,3,3)
    temporaries and their ~57x TPU tile padding."""
    rows = []
    for i in range(3):
        row = []
        for j in range(3):
            row.append(
                A[i, 0] * B[0, j] + A[i, 1] * B[1, j] + A[i, 2] * B[2, j]
            )
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def transpose(A):
    return jnp.swapaxes(A, 0, 1)


def eye_like(A):
    n = A.shape[-1]
    return jnp.broadcast_to(jnp.eye(3, dtype=A.dtype)[:, :, None], (3, 3, n))


def trace(A):
    return A[0, 0] + A[1, 1] + A[2, 2]


def det(A):
    return (
        A[0, 0] * (A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1])
        - A[0, 1] * (A[1, 0] * A[2, 2] - A[1, 2] * A[2, 0])
        + A[0, 2] * (A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0])
    )


def from_nonsym_rows(v):
    """(n, 9) nonsym vectors [11,22,33,12,21,13,31,23,32] -> (3,3,n)."""
    v = v.T  # (9, n)
    return jnp.stack(
        [
            jnp.stack([v[0], v[3], v[5]]),
            jnp.stack([v[4], v[1], v[7]]),
            jnp.stack([v[6], v[8], v[2]]),
        ]
    )


def to_nonsym_rows(A):
    """(3,3,n) -> (n,9) nonsym vectors."""
    return jnp.stack(
        [
            A[0, 0], A[1, 1], A[2, 2],
            A[0, 1], A[1, 0], A[0, 2], A[2, 0], A[1, 2], A[2, 1],
        ],
        axis=-1,
    )


def inv33(A):
    """Closed-form adjugate inverse of ``(3, 3, n)`` (feature-major twin of
    ``tensors.inv33``): 27 elementwise FMAs + one reciprocal on (n,) lanes."""
    c00 = A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1]
    c01 = A[0, 2] * A[2, 1] - A[0, 1] * A[2, 2]
    c02 = A[0, 1] * A[1, 2] - A[0, 2] * A[1, 1]
    c10 = A[1, 2] * A[2, 0] - A[1, 0] * A[2, 2]
    c11 = A[0, 0] * A[2, 2] - A[0, 2] * A[2, 0]
    c12 = A[0, 2] * A[1, 0] - A[0, 0] * A[1, 2]
    c20 = A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]
    c21 = A[0, 1] * A[2, 0] - A[0, 0] * A[2, 1]
    c22 = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    inv_det = 1.0 / det(A)
    return jnp.stack(
        [
            jnp.stack([c00, c01, c02]),
            jnp.stack([c10, c11, c12]),
            jnp.stack([c20, c21, c22]),
        ]
    ) * inv_det


_SQ2 = 2.0**0.5


def from_sym_cols(v):
    """(6, n) Mandel columns [11,22,33,sq2*12,sq2*13,sq2*23] -> (3,3,n)."""
    d = v[3] / _SQ2
    e = v[4] / _SQ2
    f = v[5] / _SQ2
    return jnp.stack(
        [
            jnp.stack([v[0], d, e]),
            jnp.stack([d, v[1], f]),
            jnp.stack([e, f, v[2]]),
        ]
    )


def to_sym_cols(A):
    """(3,3,n) (assumed symmetric; symmetrized) -> (6, n) Mandel columns."""
    return jnp.stack(
        [
            A[0, 0],
            A[1, 1],
            A[2, 2],
            _SQ2 * 0.5 * (A[0, 1] + A[1, 0]),
            _SQ2 * 0.5 * (A[0, 2] + A[2, 0]),
            _SQ2 * 0.5 * (A[1, 2] + A[2, 1]),
        ]
    )


# --------------------------------------------------------------------------
# Tuple representation: a batched 3x3 matrix as a 3x3 nested tuple of (n,)
# arrays. Functionally identical to the stacked (3,3,n) layout, but with ZERO
# stack/slice ops — reverse-mode AD through long unrolled chains of the
# stacked form makes XLA:CPU's compile superlinear (measured: grad of a
# ~45-bmm stacked chain never finishes; the tuple form compiles in seconds).
# Use tuples for anything that will be differentiated in REVERSE mode
# (energy-based models); the stacked form stays fine under forward-mode jvp.
# --------------------------------------------------------------------------


def t_from_nonsym_rows(v):
    """(n, 9) nonsym vectors -> nested-tuple matrix of (n,) components."""
    v = v.T
    return ((v[0], v[3], v[5]), (v[4], v[1], v[7]), (v[6], v[8], v[2]))


def t_transpose(A):
    return tuple(tuple(A[j][i] for j in range(3)) for i in range(3))


def t_bmm(A, B):
    return tuple(
        tuple(sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3))
        for i in range(3)
    )


def t_add(A, B):
    return tuple(tuple(A[i][j] + B[i][j] for j in range(3)) for i in range(3))


def t_scale(s, A):
    return tuple(tuple(s * A[i][j] for j in range(3)) for i in range(3))


def t_trace(A):
    return A[0][0] + A[1][1] + A[2][2]


def t_eye_like(A):
    one = jnp.ones_like(A[0][0])
    zero = jnp.zeros_like(A[0][0])
    return ((one, zero, zero), (zero, one, zero), (zero, zero, one))


def t_det(A):
    return (
        A[0][0] * (A[1][1] * A[2][2] - A[1][2] * A[2][1])
        - A[0][1] * (A[1][0] * A[2][2] - A[1][2] * A[2][0])
        + A[0][2] * (A[1][0] * A[2][1] - A[1][1] * A[2][0])
    )


def t_inv33(A):
    c00 = A[1][1] * A[2][2] - A[1][2] * A[2][1]
    c01 = A[0][2] * A[2][1] - A[0][1] * A[2][2]
    c02 = A[0][1] * A[1][2] - A[0][2] * A[1][1]
    c10 = A[1][2] * A[2][0] - A[1][0] * A[2][2]
    c11 = A[0][0] * A[2][2] - A[0][2] * A[2][0]
    c12 = A[0][2] * A[1][0] - A[0][0] * A[1][2]
    c20 = A[1][0] * A[2][1] - A[1][1] * A[2][0]
    c21 = A[0][1] * A[2][0] - A[0][0] * A[2][1]
    c22 = A[0][0] * A[1][1] - A[0][1] * A[1][0]
    idet = 1.0 / (A[0][0] * c00 + A[0][1] * c10 + A[0][2] * c20)
    return (
        (c00 * idet, c01 * idet, c02 * idet),
        (c10 * idet, c11 * idet, c12 * idet),
        (c20 * idet, c21 * idet, c22 * idet),
    )


def t_eigvals_sym(S, eps=1e-12, delta=1e-12):
    """Tuple twin of :func:`eigvals_sym` (Cardano, smooth-guarded)."""
    # dtype-aware guards: in f32, 1 - 1e-12 rounds to EXACTLY 1.0, the clip
    # becomes a no-op, and d(arccos)/dr = -1/sqrt(1-r^2) returns inf -> NaN
    # tangents at coincident eigenvalues (f32 TPU pipelines hit this; f64 does
    # not). Clamp both guards to a few ulps of the input dtype.
    feps = jnp.finfo(S[0][0].dtype).eps
    eps = jnp.maximum(eps, 4.0 * feps)
    delta = jnp.maximum(delta, 8.0 * feps)

    import numpy as np

    q = t_trace(S) / 3.0
    B00, B11, B22 = S[0][0] - q, S[1][1] - q, S[2][2] - q
    p2 = (
        B00 * B00 + B11 * B11 + B22 * B22
        + 2.0 * (S[0][1] ** 2 + S[0][2] ** 2 + S[1][2] ** 2)
    )
    scale2 = sum(S[i][j] ** 2 for i in range(3) for j in range(3))
    p = jnp.sqrt(p2 / 6.0 + eps * eps * (scale2 + 1.0))
    detB = (
        B00 * (B11 * B22 - S[1][2] * S[2][1])
        - S[0][1] * (S[1][0] * B22 - S[1][2] * S[2][0])
        + S[0][2] * (S[1][0] * S[2][1] - B11 * S[2][0])
    )
    r = jnp.clip(detB / (2.0 * p**3), -1.0 + delta, 1.0 - delta)
    phi = jnp.arccos(r) / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * np.pi / 3.0)
    lam2 = 3.0 * q - lam1 - lam3
    return lam3, lam2, lam1


def eigvals_sym(S, eps=1e-12, delta=1e-12):
    """Closed-form (Cardano) eigenvalues of symmetric (3,3,n), ascending,
    smooth-guarded (the feature-major twin of tensors.eigvals33_smooth).

    ~50 elementwise ops on (n,) lanes — the fast path for isotropic invariant
    functions (Ogden stretch powers) where eigenVECTORS are not needed."""
    # dtype-aware guards: in f32, 1 - 1e-12 rounds to EXACTLY 1.0, the clip
    # becomes a no-op, and d(arccos)/dr = -1/sqrt(1-r^2) returns inf -> NaN
    # tangents at coincident eigenvalues (f32 TPU pipelines hit this; f64 does
    # not). Clamp both guards to a few ulps of the input dtype.
    feps = jnp.finfo(S.dtype).eps
    eps = jnp.maximum(eps, 4.0 * feps)
    delta = jnp.maximum(delta, 8.0 * feps)

    import numpy as np

    q = trace(S) / 3.0
    B00 = S[0, 0] - q
    B11 = S[1, 1] - q
    B22 = S[2, 2] - q
    p2 = (
        B00 * B00 + B11 * B11 + B22 * B22
        + 2.0 * (S[0, 1] ** 2 + S[0, 2] ** 2 + S[1, 2] ** 2)
    )
    scale2 = sum(S[i, j] ** 2 for i in range(3) for j in range(3))
    p = jnp.sqrt(p2 / 6.0 + eps * eps * (scale2 + 1.0))
    detB = (
        B00 * (B11 * B22 - S[1, 2] * S[2, 1])
        - S[0, 1] * (S[1, 0] * B22 - S[1, 2] * S[2, 0])
        + S[0, 2] * (S[1, 0] * S[2, 1] - B11 * S[2, 0])
    )
    r = jnp.clip(detB / (2.0 * p**3), -1.0 + delta, 1.0 - delta)
    phi = jnp.arccos(r) / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * np.pi / 3.0)
    lam2 = 3.0 * q - lam1 - lam3
    return lam3, lam2, lam1


def sqrtm_ns(X, iters: int = 18):
    """Coupled Newton-Schulz sqrt/inv-sqrt for SPD (3,3,n).

    Iterations are ``lax.fori_loop``-rolled: the fully unrolled chain (hundreds
    of bmm's after the AD passes) explodes XLA compile time; rolled loops keep
    the HLO small at zero cost on (n,)-wide lanes."""
    import jax

    c = trace(X) / 3.0
    c = jnp.where(c <= 0, 1.0, c)
    A = X / c
    I = eye_like(X)

    def body(_, YZ):
        Y, Z = YZ
        T = 0.5 * (3.0 * I - bmm(Z, Y))
        return bmm(Y, T), bmm(T, Z)

    Y, Z = jax.lax.fori_loop(0, iters, body, (A, I))
    s = jnp.sqrt(c)
    return s * Y, Z / s


def _inv_near(A, X0, iters: int = 8):
    import jax

    I2 = 2.0 * eye_like(A)
    return jax.lax.fori_loop(
        0, iters, lambda _, X: bmm(X, I2 - bmm(A, X)), X0
    )


def logm(X, roots: int = 5, series_terms: int = 10, ns_iters: int = 16):
    import jax

    I = eye_like(X)
    Xr = jax.lax.fori_loop(
        0, roots, lambda _, M: sqrtm_ns(M, ns_iters)[0], X
    )
    S = bmm(Xr - I, _inv_near(Xr + I, 0.5 * I))
    S2 = bmm(S, S)

    def body(k, at):
        acc, term = at
        return acc + term / (2 * k + 1).astype(X.dtype), bmm(term, S2)

    acc, _ = jax.lax.fori_loop(0, series_terms, body, (jnp.zeros_like(X), S))
    return (2.0 ** (roots + 1)) * acc


def logm_gregory(X, terms: int = 5):
    """Unrolled Gregory-series log of SPD (3,3,n) with spectrum near 1.

    ``log X = 2 sum_k S^(2k+1)/(2k+1)``, ``S = (X-I)(X+I)^{-1}`` with the
    closed-form adjugate inverse — NO Newton-Schulz square roots, no
    ``fori_loop`` (rolled loops force the (3,3,n) carry through HBM every
    iteration; this unrolled elementwise chain fuses end-to-end). Per
    eigenvalue lam -> s = (lam-1)/(lam+1), truncation error
    2 s^(2T+1)/(2T+1): T=5 gives <3e-7 for lam in [0.5, 2] and ~1e-19 at the
    <=2%-elastic-strain states of metal plasticity. Callers needing arbitrary
    SPD spectra use :func:`logm`."""
    I = eye_like(X)
    S = bmm(X - I, inv33(X + I))
    S2 = bmm(S, S)
    term = S
    acc = S
    for k in range(1, terms):
        term = bmm(term, S2)
        acc = acc + term / (2 * k + 1)
    return 2.0 * acc


def expm_unrolled(X, squarings: int = 3, terms: int = 8):
    """Unrolled scaling-squaring Taylor exp of symmetric (3,3,n), small ||X||.

    Fully fusable twin of :func:`expm` for the near-identity regime (e.g.
    ``be = exp(2 eps_e)`` with elastic strains; ||X|| < 0.7 gives <1e-12
    with the defaults)."""
    s = 2.0**squarings
    A = X / s
    I = eye_like(X)
    acc = I
    term = I
    for k in range(1, terms + 1):
        term = bmm(term, A) / float(k)
        acc = acc + term
    for _ in range(squarings):
        acc = bmm(acc, acc)
    return acc


def expm(X, squarings: int = 12, series_terms: int = 14):
    import jax

    s = 2.0**squarings
    A = X / s
    I = eye_like(X)

    def series(k, at):
        acc, term = at
        term = bmm(term, A) / k.astype(X.dtype)
        return acc + term, term

    acc, _ = jax.lax.fori_loop(1, series_terms + 1, series, (I, I))
    return jax.lax.fori_loop(0, squarings, lambda _, M: bmm(M, M), acc)
