"""Host double-double dense linear algebra via error-free split GEMMs.

The quadadd.c idea (compensated arithmetic where f64 rounding is the
binding constraint) lifted from dot products to whole matrix algebra.
The IPM endgame's accuracy wall is cond(ADA) ~ 1/mu^2 against f64's
eps ~ 1e-16: once cond * eps > 1, neither factorization nor iterative
refinement in f64 contracts, and the terminal iterate floors around
1e-7 (measured; VERDICT r4 item 2).  Double-double (~1e-32) arithmetic
moves that wall to cond ~ 1e30 — beyond anything a terminating IPM
produces.

The expensive kernels use the Ozaki error-free splitting scheme
[Ozaki, Ogita, Oishi, Rump, Numer. Algorithms 2012]: each f64 operand
is split into 3 slices of t bits, t = floor((53 - ceil(log2(k)))/2)
for accumulation length k, so every slice-pair dgemm — including its
internal SUMS — is exact in f64.  A double-double GEMM is then 9 exact
dgemms plus 2 plain cross-term dgemms, accumulated with TwoSum: ~11x
the f64 cost, running entirely on BLAS.

Everything here is host-side numpy (used by the `dd64` endgame phase
via jax.pure_callback on the CPU backend; sizes m <= O(10^3)).
"""

from __future__ import annotations

import numpy as np

_SPLIT_FACTOR = 134217729.0          # 2^27 + 1 (Dekker)


def two_sum(a, b):
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def two_prod(a, b):
    p = a * b
    ah = _SPLIT_FACTOR * a
    ah = ah - (ah - a)
    al = a - ah
    bh = _SPLIT_FACTOR * b
    bh = bh - (bh - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dd_normalize(h, l):
    return two_sum(h, l)


def dd_add(ah, al, bh, bl):
    sh, se = two_sum(ah, bh)
    return dd_normalize(sh, se + al + bl)


def dd_sub(ah, al, bh, bl):
    return dd_add(ah, al, -bh, -bl)


def dd_mul(ah, al, bh, bl):
    ph, pe = two_prod(ah, bh)
    return dd_normalize(ph, pe + ah * bl + al * bh)


def dd_div(ah, al, bh, bl):
    q1 = ah / bh
    # r = a - q1 * b in dd
    ph, pl = dd_mul(q1, np.zeros_like(q1), bh, bl)
    rh, rl = dd_sub(ah, al, ph, pl)
    q2 = (rh + rl) / bh
    return dd_normalize(q1, q2)


def dd_sqrt(ah, al):
    s = np.sqrt(np.maximum(ah, 0.0))
    # one dd Newton step: s + (a - s^2) / (2 s)
    ph, pl = two_prod(s, s)
    rh, rl = dd_sub(ah, al, ph, pl)
    e = (rh + rl) / np.maximum(2.0 * s, 1e-300)
    return dd_normalize(s, e)


def _ozaki_split(A: np.ndarray, k: int, axis: int, nsplit: int = 3):
    """Error-free split of f64 A into nsplit slices of t bits each along
    the accumulation dimension of length k (per-row/col scaled)."""
    t = max(1, (53 - max(int(np.ceil(np.log2(max(k, 2)))), 1)) // 2)
    slices = []
    R = A.copy()
    for _ in range(nsplit - 1):
        mu = np.max(np.abs(R), axis=axis, keepdims=True)
        # sigma = 2^(ceil(log2(mu)) + 53 - t): adding/subtracting rounds
        # R to its top t bits relative to the row/col scale
        with np.errstate(divide="ignore"):
            expo = np.ceil(np.log2(np.where(mu > 0, mu, 1.0)))
        sigma = np.ldexp(1.0, (expo + 53 - t).astype(np.int64))
        S = (R + sigma) - sigma
        slices.append(S)
        R = R - S
    slices.append(R)
    return slices


def dd_gemm(Ah, Al, Bh, Bl):
    """(Ah+Al) @ (Bh+Bl) in double-double: exact slice dgemms + cross
    terms.  Ah: (m,k), Bh: (k,n); Al/Bl may be None (pure f64 inputs)."""
    k = Ah.shape[-1]
    As = _ozaki_split(Ah, k, axis=-1)
    Bs = _ozaki_split(Bh, k, axis=0 if Bh.ndim == 2 else -1)
    # accumulate the 9 exact partials largest-first
    Sh = As[0] @ Bs[0]
    Sl = np.zeros_like(Sh)
    order = [(0, 1), (1, 0), (0, 2), (1, 1), (2, 0),
             (1, 2), (2, 1), (2, 2)]
    for i, j in order:
        P = As[i] @ Bs[j]
        Sh, e = two_sum(Sh, P)
        Sl += e
    if Bl is not None:
        Sh, e = two_sum(Sh, Ah @ Bl)
        Sl += e
    if Al is not None:
        Sh, e = two_sum(Sh, Al @ Bh)
        Sl += e
    return dd_normalize(Sh, Sl)


def dd_gemv(Ah, Al, xh, xl):
    """Matrix-vector product in dd (via dd_gemm on a column)."""
    yh, yl = dd_gemm(Ah, Al, xh[:, None], None if xl is None
                     else xl[:, None])
    return yh[:, 0], yl[:, 0]


class DdCholFactor:
    """Double-double Cholesky L L' = A (+ jitter on pivot failure)."""

    def __init__(self, Lh, Ll, inv_diag, nb, ok):
        self.Lh, self.Ll = Lh, Ll
        self.inv_diag = inv_diag      # list of (invh, invl) per panel
        self.nb = nb
        self.ok = ok


def dd_chol(Ah: np.ndarray, Al: np.ndarray | None = None,
            nb: int = 48) -> DdCholFactor:
    """Left-looking blocked dd Cholesky of an SPD matrix given as a dd
    pair; panel updates use dd_gemm, the panel factorization runs a
    vectorized dd column loop."""
    m = Ah.shape[0]
    if Al is None:
        Al = np.zeros_like(Ah)
    Lh = np.zeros((m, m))
    Ll = np.zeros((m, m))
    ok = True
    for p0 in range(0, m, nb):
        p1 = min(p0 + nb, m)
        Sh = Ah[p0:, p0:p1].copy()
        Sl = Al[p0:, p0:p1].copy()
        if p0:
            Uh, Ul = dd_gemm(Lh[p0:, :p0], Ll[p0:, :p0],
                             Lh[p0:p1, :p0].T, Ll[p0:p1, :p0].T)
            Sh, Sl = dd_sub(Sh, Sl, Uh, Ul)
        w = p1 - p0
        for j in range(w):
            dh, dl = Sh[j, j], Sl[j, j]
            if not (dh > 0):
                dh, dl = max(abs(dh), 1e-300), 0.0
                ok = False
            sh_, sl_ = dd_sqrt(np.asarray(dh), np.asarray(dl))
            ch, cl = dd_div(Sh[j:, j], Sl[j:, j],
                            np.asarray(sh_), np.asarray(sl_))
            Lh[p0 + j:, p0 + j], Ll[p0 + j:, p0 + j] = ch, cl
            if j + 1 < w:
                # S[:, j+1:w] -= outer(col, col[1:..]) in dd
                ph, pe = two_prod(ch[1:, None], ch[None, 1:w - j])
                pl = pe + ch[1:, None] * cl[None, 1:w - j] \
                    + cl[1:, None] * ch[None, 1:w - j]
                Sh2, Sl2 = dd_sub(Sh[j + 1:, j + 1:w], Sl[j + 1:, j + 1:w],
                                  ph, pl)
                Sh[j + 1:, j + 1:w], Sl[j + 1:, j + 1:w] = Sh2, Sl2
    # precompute dd inverses of the diagonal panels so triangular solves
    # are pure dd_gemm (no per-solve scalar loops)
    inv_diag = []
    for p0 in range(0, m, nb):
        p1 = min(p0 + nb, m)
        w = p1 - p0
        Ih = np.zeros((w, w))
        Il = np.zeros((w, w))
        Eh = np.eye(w)
        El = np.zeros((w, w))
        for j in range(w):
            qh, ql = dd_div(Eh[j], El[j],
                            np.asarray(Lh[p0 + j, p0 + j]),
                            np.asarray(Ll[p0 + j, p0 + j]))
            Ih[j], Il[j] = qh, ql
            if j + 1 < w:
                lh = Lh[p0 + j + 1:p1, p0 + j]
                ll = Ll[p0 + j + 1:p1, p0 + j]
                ph, pe = two_prod(lh[:, None], qh[None, :])
                pl = pe + lh[:, None] * ql[None, :] + ll[:, None] * qh[None, :]
                Eh2, El2 = dd_sub(Eh[j + 1:], El[j + 1:], ph, pl)
                Eh[j + 1:], El[j + 1:] = Eh2, El2
        inv_diag.append((Ih, Il))     # rows of inv(L_pp)
    return DdCholFactor(Lh, Ll, inv_diag, nb, ok)


def dd_chol_solve(f: DdCholFactor, bh: np.ndarray,
                  bl: np.ndarray | None = None):
    """Solve L L' x = b in dd, blockwise (dd_gemm only on the panels)."""
    m = f.Lh.shape[0]
    nb = f.nb
    if bl is None:
        bl = np.zeros_like(bh)
    xh = np.zeros(m)
    xl = np.zeros(m)
    # forward: L y = b
    for p0 in range(0, m, nb):
        p1 = min(p0 + nb, m)
        rh, rl = bh[p0:p1].copy(), bl[p0:p1].copy()
        if p0:
            uh, ul = dd_gemv(f.Lh[p0:p1, :p0], f.Ll[p0:p1, :p0],
                             xh[:p0], xl[:p0])
            rh, rl = dd_sub(rh, rl, uh, ul)
        Ih, Il = f.inv_diag[p0 // nb]
        yh, yl = dd_gemv(Ih, Il, rh, rl)
        xh[p0:p1], xl[p0:p1] = yh, yl
    # backward: L' z = y
    zh = np.zeros(m)
    zl = np.zeros(m)
    panels = list(range(0, m, nb))
    for p0 in reversed(panels):
        p1 = min(p0 + nb, m)
        rh, rl = xh[p0:p1].copy(), xl[p0:p1].copy()
        if p1 < m:
            uh, ul = dd_gemv(f.Lh[p1:, p0:p1].T, f.Ll[p1:, p0:p1].T,
                             zh[p1:], zl[p1:])
            rh, rl = dd_sub(rh, rl, uh, ul)
        Ih, Il = f.inv_diag[p0 // nb]
        yh, yl = dd_gemv(Ih.T, Il.T, rh, rl)
        zh[p0:p1], zl[p0:p1] = yh, yl
    return zh, zl
