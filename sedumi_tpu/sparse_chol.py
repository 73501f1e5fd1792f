"""Tile-supernodal sparse Cholesky on device, planned by the native engine.

Reference analog: the L3 sparse factorization engine — ordmmd.c (ordering),
symfct.c (symbolic), cholsplit.c (cache-size panels), blkchol.c/blkchol2.c
(supernodal numeric LDL'), fwblkslv.c/bwblkslv.c (triangular solves).

TPU-first redesign (SURVEY.md section 7 item 4): instead of per-supernode
scalar loops, the factor is stored as a list of dense BxB *tiles* on the
AMD-permuted matrix; the host (C++ native engine + this planner) computes
the tile-level fill pattern and a static schedule; the device executes a
right-looking factorization as one lax.fori_loop over tile-columns whose
body is nothing but batched BxB matmuls / triangular solves (MXU shapes),
with all gather/scatter targets precomputed as int32 plan arrays.  Padding
slots point at a trash tile, so the loop body is branch-free.

Numeric robustness: each diagonal tile is factored with a traced
regularization added where pivots fall below canceltol * max|diag| (the
diag-add semantics of blkchol.c:176-184); the factor is consumed as a PCG
preconditioner by the caller, which plays the role of the reference's
pivot-skip + PCG fallback (wrapPcg.m).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from . import native


class TilePlan(NamedTuple):
    """Static host-side factorization plan (all arrays device-ready)."""

    n: int                 # padded matrix order (multiple of B)
    B: int                 # tile size
    perm: np.ndarray       # AMD permutation, length n_orig (new->old)
    ntc: int               # number of tile columns
    nslot: int             # number of stored tiles (last slot = trash)
    # per tile-column arrays (padded; pad targets point at the trash slot)
    dslot: jnp.ndarray     # [ntc] slot of the diagonal tile
    oslot: jnp.ndarray     # [ntc, maxo] slots of off-diagonal tiles in column
    omask: jnp.ndarray     # [ntc, maxo] validity
    pa: jnp.ndarray        # [ntc, maxp] update source A (slot in column j)
    pb: jnp.ndarray        # [ntc, maxp] update source B (slot in column j)
    pdst: jnp.ndarray      # [ntc, maxp] update destination slot
    pmask: jnp.ndarray     # [ntc, maxp]
    # solve-phase metadata
    orow: jnp.ndarray      # [ntc, maxo] row-tile index of each off tile
    # assembly scatter: flat position in tile storage for each nz of the
    # permuted input matrix (lower triangle)
    asm_dst: jnp.ndarray   # [nnz_lower] -> flat index into [nslot*B*B]
    slot_of: dict          # (rowtile, coltile) -> slot   (host only)
    # elimination-tree level schedule (reference analog: the task
    # parallelism implicit in blkchol2.c's linked-list ordering, realized
    # here as per-level BATCHED kernels; host_engine.cc sed_levels):
    # all tile-columns at one level are independent and factor together.
    nlev: int = 0
    lv_cols: jnp.ndarray | None = None   # [nlev, maxc] column ids (pad=ntc)
    lv_cmask: jnp.ndarray | None = None  # [nlev, maxc] validity
    # exact per-level lists for the UNROLLED kernels (host-static):
    # ((col ids...), maxo_level, maxp_level) per level
    lv_lists: tuple = ()


def plan_tiles(pattern: sp.spmatrix, B: int = 128,
               order: np.ndarray | None = None) -> TilePlan:
    """Build the static tile plan for the symmetric pattern `pattern`.

    Host pipeline: AMD ordering (native.sed_amd) -> elimination tree ->
    tile-level symbolic fill -> schedule arrays.
    """
    n0 = pattern.shape[0]
    perm = native.amd_order(pattern) if order is None else np.asarray(order)
    P = sp.csc_matrix(pattern)[perm][:, perm]
    n = ((n0 + B - 1) // B) * B
    ntc = n // B

    # tile-level quotient pattern of P (+identity padding)
    coo = P.tocoo()
    rt = coo.row // B
    ct = coo.col // B
    Q = sp.csc_matrix(
        (np.ones(rt.size + ntc), (np.concatenate([rt, np.arange(ntc)]),
                                  np.concatenate([ct, np.arange(ntc)]))),
        shape=(ntc, ntc),
    )
    # symbolic fill at tile level
    parent = native.etree(Q)
    Lpat = native.symbolic_pattern(Q, parent)  # lower incl diag

    # slot numbering: column-major over tile columns
    lp = Lpat.tocsc()
    slot_of: dict[tuple[int, int], int] = {}
    s = 0
    for j in range(ntc):
        for p in range(lp.indptr[j], lp.indptr[j + 1]):
            i = int(lp.indices[p])
            slot_of[(i, j)] = s
            s += 1
    nslot = s + 1  # + trash
    trash = s

    cols_rows = [
        [int(lp.indices[p]) for p in range(lp.indptr[j], lp.indptr[j + 1])]
        for j in range(ntc)
    ]
    maxo = max((len(r) - 1 for r in cols_rows), default=0)
    maxo = max(maxo, 1)
    maxp = 1
    for rows in cols_rows:
        k = len(rows) - 1
        maxp = max(maxp, k * (k + 1) // 2)

    dslot = np.full(ntc, trash, np.int32)
    oslot = np.full((ntc, maxo), trash, np.int32)
    omask = np.zeros((ntc, maxo), bool)
    orow = np.zeros((ntc, maxo), np.int32)
    pa = np.full((ntc, maxp), trash, np.int32)
    pb = np.full((ntc, maxp), trash, np.int32)
    pdst = np.full((ntc, maxp), trash, np.int32)
    pmask = np.zeros((ntc, maxp), bool)

    for j in range(ntc):
        rows = cols_rows[j]
        assert rows and rows[0] == j, (j, rows[:3])
        dslot[j] = slot_of[(j, j)]
        off = rows[1:]
        for t, i in enumerate(off):
            oslot[j, t] = slot_of[(i, j)]
            omask[j, t] = True
            orow[j, t] = i
        # update pairs: for i >= k (both in off), tile (i,k) in column k
        t = 0
        for ki, k in enumerate(off):
            for i in off[ki:]:
                pa[j, t] = slot_of[(i, j)]
                pb[j, t] = slot_of[(k, j)]
                pdst[j, t] = slot_of.get((i, k), trash)
                pmask[j, t] = (i, k) in slot_of
                t += 1

    # level schedule: batch independent tile-columns per etree level.  A
    # padding row (column id = ntc) is appended to every per-column array:
    # its diagonal tile is the trash slot (zeros -> chol(lift*I), finite),
    # its off/update entries are fully masked.
    lev = native.levels(parent)
    nlev = int(lev.max()) + 1 if ntc else 0
    bylev = [np.nonzero(lev == l)[0] for l in range(nlev)]
    # exact per-level lists for the unrolled kernels: the padded batched
    # level loop costs nlev * maxc * maxp tile-ops while real problems
    # have wildly varying level widths (measured: 277 s per factorization
    # at m=20480 on this host, dominated by padding)
    noff = [len(r) - 1 for r in cols_rows]
    npair = [k * (k + 1) // 2 for k in noff]
    lv_lists = tuple(
        (tuple(int(j) for j in g),
         max((noff[j] for j in g), default=0),
         max((npair[j] for j in g), default=0))
        for g in bylev)
    maxc = max((g.size for g in bylev), default=1)
    lv_cols = np.full((max(nlev, 1), maxc), ntc, np.int32)
    lv_cmask = np.zeros((max(nlev, 1), maxc), bool)
    for l, g in enumerate(bylev):
        lv_cols[l, : g.size] = g
        lv_cmask[l, : g.size] = True
    dslot = np.concatenate([dslot, [trash]]).astype(np.int32)
    oslot = np.vstack([oslot, np.full((1, maxo), trash, np.int32)])
    omask = np.vstack([omask, np.zeros((1, maxo), bool)])
    orow = np.vstack([orow, np.zeros((1, maxo), np.int32)])
    pa = np.vstack([pa, np.full((1, maxp), trash, np.int32)])
    pb = np.vstack([pb, np.full((1, maxp), trash, np.int32)])
    pdst = np.vstack([pdst, np.full((1, maxp), trash, np.int32)])
    pmask = np.vstack([pmask, np.zeros((1, maxp), bool)])

    # assembly map for the lower triangle of the permuted matrix
    mask_low = coo.row >= coo.col
    ri, ci = coo.row[mask_low], coo.col[mask_low]
    st = np.asarray([slot_of[(int(r) // B, int(c) // B)]
                     for r, c in zip(ri, ci)], np.int64)
    asm_dst = st * (B * B) + (ri % B).astype(np.int64) * B + (ci % B)

    return TilePlan(
        n=n, B=B, perm=perm, ntc=ntc, nslot=nslot,
        dslot=jnp.asarray(dslot), oslot=jnp.asarray(oslot),
        omask=jnp.asarray(omask), pa=jnp.asarray(pa), pb=jnp.asarray(pb),
        pdst=jnp.asarray(pdst), pmask=jnp.asarray(pmask),
        orow=jnp.asarray(orow), asm_dst=jnp.asarray(asm_dst),
        slot_of=slot_of,
        nlev=nlev, lv_cols=jnp.asarray(lv_cols),
        lv_cmask=jnp.asarray(lv_cmask), lv_lists=lv_lists,
    )


def assemble_tiles(plan: TilePlan, vals_lower: jnp.ndarray,
                   dtype=jnp.float64) -> jnp.ndarray:
    """Scatter the lower-triangle nz values (in plan order) into tile
    storage [nslot, B, B]."""
    flat = jnp.zeros(plan.nslot * plan.B * plan.B, dtype)
    flat = flat.at[plan.asm_dst].add(vals_lower.astype(dtype))
    return flat.reshape(plan.nslot, plan.B, plan.B)


@partial(jax.jit, static_argnames=("ntc", "canceltol"))
def factor_tiles(storage: jnp.ndarray, dslot, oslot, omask, pa, pb, pdst,
                 pmask, reg: jnp.ndarray, ntc: int,
                 canceltol: float = 1e-12) -> jnp.ndarray:
    """Right-looking tile Cholesky.  storage: [nslot, B, B] holding the
    lower triangle of the permuted matrix; returns L in the same layout.

    Diagonal tiles get the blkchol.c diag-add treatment: pivots below
    canceltol * max|diag| (or the traced `reg`) are lifted before the dense
    BxB factorization, so the factorization never fails; the (small)
    perturbation is corrected by the caller's PCG/refinement loop.
    """
    B = storage.shape[-1]
    eyeB = jnp.eye(B, dtype=storage.dtype)

    def body(j, st):
        dj = dslot[j]
        D = st[dj]
        # storage holds only the lower triangle of diagonal tiles; rebuild
        # the full symmetric tile (jnp.linalg.cholesky symmetrizes input)
        D = jnp.tril(D) + jnp.swapaxes(jnp.tril(D, -1), -1, -2)
        dmax = jnp.max(jnp.abs(jnp.diagonal(D)))
        lift = jnp.maximum(reg, canceltol * dmax) + 1e-300
        Dl = D + lift * eyeB
        LD = jnp.linalg.cholesky(Dl)
        # indefinite beyond the lift: escalate, then last-resort diagonal
        # factor (the pivot-skip role of blkchol2.c:96-167 — the factor
        # stays finite and usable as a preconditioner; PCG repairs the rest)
        bad1 = jnp.any(jnp.isnan(LD))
        LD2 = jnp.linalg.cholesky(Dl + (dmax + 1.0) * eyeB)
        LD = jnp.where(bad1, LD2, LD)
        bad2 = jnp.any(jnp.isnan(LD))
        LDdiag = jnp.sqrt(jnp.abs(jnp.diagonal(Dl)) + dmax + 1.0) * eyeB
        LD = jnp.where(bad2, LDdiag, LD)
        st = st.at[dj].set(LD)

        # off tiles: X = T @ LD^{-T}
        Ts = st[oslot[j]]                       # [maxo, B, B]
        X = jax.lax.linalg.triangular_solve(
            jnp.broadcast_to(LD, Ts.shape), Ts,
            left_side=False, lower=True, transpose_a=True,
        )
        X = jnp.where(omask[j][:, None, None], X, Ts * 0.0)
        st = st.at[oslot[j]].set(jnp.where(omask[j][:, None, None], X, st[oslot[j]]))

        # trailing updates: dst -= A @ B'
        Asrc = st[pa[j]]                        # [maxp, B, B]
        Bsrc = st[pb[j]]
        U = jnp.einsum("kab,kcb->kac", Asrc, Bsrc)
        U = jnp.where(pmask[j][:, None, None], U, 0.0)
        st = st.at[pdst[j]].add(-U)
        return st

    return jax.lax.fori_loop(0, ntc, body, storage)


@partial(jax.jit, static_argnames=("nlev", "canceltol"))
def factor_tiles_lv(storage: jnp.ndarray, dslot, oslot, omask, pa, pb, pdst,
                    pmask, lv_cols, reg: jnp.ndarray, nlev: int,
                    canceltol: float = 1e-12) -> jnp.ndarray:
    """Level-scheduled tile Cholesky: one fori_loop over ETREE LEVELS, each
    level factoring ALL its independent tile-columns as one batched kernel.

    Same numeric semantics as factor_tiles (diag-add robustness per
    blkchol.c:176-184) but sequential depth = tree height instead of the
    number of tile columns — the TPU realization of the supernodal task
    parallelism that blkchol2.c:522-557 leaves implicit (SURVEY.md
    section 2.8 'pipeline across elimination-tree levels').

    Correctness of the batching: a column only READS tiles written by its
    descendants (strictly lower levels) and WRITES (scatter-add) tiles of
    its ancestors (strictly higher levels); same-level writes to a shared
    destination commute because scatter-add accumulates.
    """
    B = storage.shape[-1]
    eyeB = jnp.eye(B, dtype=storage.dtype)

    def body(l, st):
        cols = lv_cols[l]                      # [C] (pad id points at trash)
        djs = dslot[cols]                      # [C]
        D = st[djs]
        D = jnp.tril(D) + jnp.swapaxes(jnp.tril(D, -1), -1, -2)
        dmax = jnp.max(jnp.abs(jnp.diagonal(D, axis1=-2, axis2=-1)), axis=-1)
        lift = jnp.maximum(reg, canceltol * dmax) + 1e-300
        Dl = D + lift[:, None, None] * eyeB
        LD = jnp.linalg.cholesky(Dl)
        bad1 = jnp.any(jnp.isnan(LD), axis=(-2, -1))
        LD2 = jnp.linalg.cholesky(Dl + (dmax + 1.0)[:, None, None] * eyeB)
        LD = jnp.where(bad1[:, None, None], LD2, LD)
        bad2 = jnp.any(jnp.isnan(LD), axis=(-2, -1))
        LDdiag = jnp.sqrt(jnp.abs(jnp.diagonal(Dl, axis1=-2, axis2=-1))
                          + (dmax + 1.0)[:, None])[..., None] * eyeB
        LD = jnp.where(bad2[:, None, None], LDdiag, LD)
        st = st.at[djs].set(LD)

        osl = oslot[cols]                      # [C, maxo]
        Ts = st[osl]                           # [C, maxo, B, B]
        X = jax.lax.linalg.triangular_solve(
            jnp.broadcast_to(LD[:, None], Ts.shape), Ts,
            left_side=False, lower=True, transpose_a=True,
        )
        om = omask[cols]
        st = st.at[osl].set(jnp.where(om[..., None, None], X, Ts))

        Asrc = st[pa[cols]]                    # [C, maxp, B, B]
        Bsrc = st[pb[cols]]
        U = jnp.einsum("cpab,cpdb->cpad", Asrc, Bsrc)
        U = jnp.where(pmask[cols][..., None, None], U, 0.0)
        st = st.at[pdst[cols]].add(-U)
        return st

    return jax.lax.fori_loop(0, max(nlev, 1), body, storage)


@partial(jax.jit, static_argnames=("nlev",))
def solve_tiles_lv(L: jnp.ndarray, rhs: jnp.ndarray, dslot, oslot, omask,
                   orow, lv_cols, lv_cmask, nlev: int) -> jnp.ndarray:
    """Level-scheduled triangular solves (fw/bwblkslv.c role), batched per
    etree level like factor_tiles_lv."""
    B = L.shape[-1]
    ntc = rhs.shape[0] // B
    y = rhs.reshape(ntc, B)
    # pad row for the trash column id
    ypad = jnp.concatenate([y, jnp.zeros((1, B), y.dtype)], axis=0)

    def fwd(l, yp):
        cols = lv_cols[l]
        LD = L[dslot[cols]]
        yj = jax.lax.linalg.triangular_solve(
            LD, yp[cols][..., None], left_side=True, lower=True)[..., 0]
        yj = jnp.where(lv_cmask[l][:, None], yj, 0.0)
        yp = yp.at[cols].set(yj)
        Ts = L[oslot[cols]]                    # [C, maxo, B, B]
        contrib = jnp.einsum("coab,cb->coa", Ts, yj)
        contrib = jnp.where(omask[cols][..., None], contrib, 0.0)
        yp = yp.at[orow[cols]].add(-contrib)
        return yp

    ypad = jax.lax.fori_loop(0, max(nlev, 1), fwd, ypad)

    def bwd(t, yp):
        l = nlev - 1 - t
        cols = lv_cols[l]
        Ts = L[oslot[cols]]
        gathered = yp[orow[cols]]              # [C, maxo, B]
        corr = jnp.einsum(
            "coab,coa->cb", Ts,
            jnp.where(omask[cols][..., None], gathered, 0.0))
        LD = L[dslot[cols]]
        yj = jax.lax.linalg.triangular_solve(
            LD, (yp[cols] - corr)[..., None], left_side=True, lower=True,
            transpose_a=True)[..., 0]
        yj = jnp.where(lv_cmask[l][:, None], yj, 0.0)
        yp = yp.at[cols].set(yj)
        return yp

    ypad = jax.lax.fori_loop(0, max(nlev, 1), bwd, ypad)
    return ypad[:ntc].reshape(-1)


@partial(jax.jit, static_argnames=("ntc",))
def solve_tiles(L: jnp.ndarray, rhs: jnp.ndarray, dslot, oslot, omask, orow,
                ntc: int) -> jnp.ndarray:
    """Solve L L' x = rhs with the tile factor.  rhs: [n] (padded)."""
    B = L.shape[-1]
    y = rhs.reshape(ntc, B)

    def fwd(j, y):
        LD = L[dslot[j]]
        yj = jax.lax.linalg.triangular_solve(
            LD, y[j][:, None], left_side=True, lower=True,
        )[:, 0]
        y = y.at[j].set(yj)
        Ts = L[oslot[j]]                          # [maxo, B, B]
        contrib = jnp.einsum("kab,b->ka", Ts, yj)
        contrib = jnp.where(omask[j][:, None], contrib, 0.0)
        y = y.at[orow[j]].add(-contrib)
        return y

    y = jax.lax.fori_loop(0, ntc, fwd, y)

    def bwd(t, y):
        j = ntc - 1 - t
        Ts = L[oslot[j]]
        gathered = y[orow[j]]                     # [maxo, B]
        corr = jnp.einsum("kab,ka->b", Ts, jnp.where(omask[j][:, None], gathered, 0.0))
        LD = L[dslot[j]]
        yj = jax.lax.linalg.triangular_solve(
            LD, (y[j] - corr)[:, None], left_side=True, lower=True,
            transpose_a=True,
        )[:, 0]
        y = y.at[j].set(yj)
        return y

    y = jax.lax.fori_loop(0, ntc, bwd, y)
    return y.reshape(-1)


class SparseCholesky:
    """Host-facing wrapper: plan once, factor/solve many times.

    Plays the role of symbchol.m (symbolic, once) + blkchol/fw/bwblkslv
    (numeric, per iteration).  `factor(M)` takes the sparse SPD matrix with
    the SAME pattern as planned; `solve(b)` returns M^{-1} b (approximately,
    when diag-adds fired — combine with pcg.pcg for exactness).
    """

    def __init__(self, pattern: sp.spmatrix, B: int = 128):
        self.plan = plan_tiles(pattern, B=B)
        # precompute the nz -> vals_lower gather for matrices in csc with
        # the planned pattern: we re-extract values through the permutation
        p = self.plan.perm
        self._n0 = pattern.shape[0]
        self._iperm = np.empty_like(p)
        self._iperm[p] = np.arange(p.size)

    def factor(self, M: sp.spmatrix, reg: float = 0.0) -> jnp.ndarray:
        Mp = sp.csc_matrix(M)[self.plan.perm][:, self.plan.perm].tocoo()
        mask = Mp.row >= Mp.col
        # assembly order must match plan_tiles' coo order; rebuild dst here
        # from the actual coo (patterns can differ in nz ordering)
        B = self.plan.B
        ri, ci = Mp.row[mask], Mp.col[mask]
        st = np.asarray(
            [self.plan.slot_of.get((int(r) // B, int(c) // B), self.plan.nslot - 1)
             for r, c in zip(ri, ci)], np.int64)
        dst = st * (B * B) + (ri % B).astype(np.int64) * B + (ci % B)
        flat = jnp.zeros(self.plan.nslot * B * B, jnp.float64)
        flat = flat.at[jnp.asarray(dst)].add(jnp.asarray(Mp.data[mask]))
        # identity on the padded tail so padded pivots are well-defined
        if self.plan.n > self._n0:
            pad = np.arange(self._n0, self.plan.n)
            pst = np.asarray([self.plan.slot_of[(int(i) // B, int(i) // B)]
                              for i in pad], np.int64)
            pdsti = pst * (B * B) + (pad % B) * B + (pad % B)
            flat = flat.at[jnp.asarray(pdsti)].add(1.0)
        storage = flat.reshape(self.plan.nslot, B, B)
        pl = self.plan
        return factor_tiles(storage, pl.dslot, pl.oslot, pl.omask, pl.pa,
                            pl.pb, pl.pdst, pl.pmask,
                            jnp.asarray(float(reg)), pl.ntc)

    def solve(self, L: jnp.ndarray, b: np.ndarray) -> np.ndarray:
        pl = self.plan
        bp = np.zeros(pl.n)
        bp[: self._n0] = np.asarray(b)[pl.perm]
        x = solve_tiles(L, jnp.asarray(bp), pl.dslot, pl.oslot, pl.omask,
                        pl.orow, pl.ntc)
        out = np.zeros(self._n0)
        out = np.asarray(x)[: self._n0][self._iperm]
        return out

    def solve_device(self, L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """jit-composable solve (usable inside pcg/while_loop bodies):
        permutation applied with device gathers."""
        pl = self.plan
        bp = jnp.zeros(pl.n, b.dtype).at[: self._n0].set(b[jnp.asarray(pl.perm)])
        x = solve_tiles(L, bp, pl.dslot, pl.oslot, pl.omask, pl.orow, pl.ntc)
        return x[: self._n0][jnp.asarray(self._iperm)]


def factor_tiles_ur(storage: jnp.ndarray, dslot, oslot, omask, pa, pb, pdst,
                    pmask, lv_lists, reg: jnp.ndarray,
                    canceltol: float = 1e-12) -> jnp.ndarray:
    """Unrolled level-scheduled tile Cholesky with EXACT per-level shapes.

    Same numeric semantics as factor_tiles_lv, but each level's kernel is
    traced with that level's true column count and trimmed off-tile/update
    widths (lv_lists is host-static).  The padded fori_loop version costs
    nlev * maxc * maxp tile-ops regardless of the actual schedule —
    measured 277 s per factorization at m=20480 on this host, almost all
    of it multiplying trash-slot padding.  Unrolling trades a slightly
    larger (still level-count-bounded) compile for the exact O(sum of
    level work).  Callers should prefer this whenever the level count is
    modest (engine falls back to factor_tiles_lv above 64 levels).
    """
    B = storage.shape[-1]
    eyeB = jnp.eye(B, dtype=storage.dtype)
    st = storage
    for cols_t, maxo_l, maxp_l in lv_lists:
        cols = np.asarray(cols_t, np.int32)
        djs = dslot[cols]
        D = st[djs]
        D = jnp.tril(D) + jnp.swapaxes(jnp.tril(D, -1), -1, -2)
        dmax = jnp.max(jnp.abs(jnp.diagonal(D, axis1=-2, axis2=-1)), axis=-1)
        lift = jnp.maximum(reg, canceltol * dmax) + 1e-300
        Dl = D + lift[:, None, None] * eyeB
        LD = jnp.linalg.cholesky(Dl)
        bad1 = jnp.any(jnp.isnan(LD), axis=(-2, -1))
        LD2 = jnp.linalg.cholesky(Dl + (dmax + 1.0)[:, None, None] * eyeB)
        LD = jnp.where(bad1[:, None, None], LD2, LD)
        bad2 = jnp.any(jnp.isnan(LD), axis=(-2, -1))
        LDdiag = jnp.sqrt(jnp.abs(jnp.diagonal(Dl, axis1=-2, axis2=-1))
                          + (dmax + 1.0)[:, None])[..., None] * eyeB
        LD = jnp.where(bad2[:, None, None], LDdiag, LD)
        st = st.at[djs].set(LD)

        if maxo_l:
            osl = oslot[cols][:, :maxo_l]
            Ts = st[osl]
            X = jax.lax.linalg.triangular_solve(
                jnp.broadcast_to(LD[:, None], Ts.shape), Ts,
                left_side=False, lower=True, transpose_a=True,
            )
            om = omask[cols][:, :maxo_l]
            st = st.at[osl].set(jnp.where(om[..., None, None], X, Ts))
        if maxp_l:
            pac = pa[cols][:, :maxp_l]
            pbc = pb[cols][:, :maxp_l]
            Asrc = st[pac]
            Bsrc = st[pbc]
            U = jnp.einsum("cpab,cpdb->cpad", Asrc, Bsrc)
            U = jnp.where(pmask[cols][:, :maxp_l][..., None, None], U, 0.0)
            st = st.at[pdst[cols][:, :maxp_l]].add(-U)
    return st


def solve_tiles_ur(L: jnp.ndarray, rhs: jnp.ndarray, dslot, oslot, omask,
                   orow, lv_lists, ntc: int) -> jnp.ndarray:
    """Unrolled exact-shape triangular solves (companion of
    factor_tiles_ur)."""
    B = L.shape[-1]
    y = rhs.reshape(ntc, B)
    ypad = jnp.concatenate([y, jnp.zeros((1, B), y.dtype)], axis=0)

    for cols_t, maxo_l, _ in lv_lists:
        cols = np.asarray(cols_t, np.int32)
        LD = L[dslot[cols]]
        yj = jax.lax.linalg.triangular_solve(
            LD, ypad[cols][..., None], left_side=True, lower=True)[..., 0]
        ypad = ypad.at[cols].set(yj)
        if maxo_l:
            Ts = L[oslot[cols][:, :maxo_l]]
            contrib = jnp.einsum("coab,cb->coa", Ts, yj)
            contrib = jnp.where(omask[cols][:, :maxo_l][..., None],
                                contrib, 0.0)
            ypad = ypad.at[orow[cols][:, :maxo_l]].add(-contrib)

    for cols_t, maxo_l, _ in reversed(lv_lists):
        cols = np.asarray(cols_t, np.int32)
        yc = ypad[cols]
        if maxo_l:
            Ts = L[oslot[cols][:, :maxo_l]]
            gathered = ypad[orow[cols][:, :maxo_l]]
            corr = jnp.einsum(
                "coab,coa->cb", Ts,
                jnp.where(omask[cols][:, :maxo_l][..., None], gathered, 0.0))
            yc = yc - corr
        LD = L[dslot[cols]]
        yj = jax.lax.linalg.triangular_solve(
            LD, yc[..., None], left_side=True, lower=True,
            transpose_a=True)[..., 0]
        ypad = ypad.at[cols].set(yj)
    return ypad[:ntc].reshape(-1)
