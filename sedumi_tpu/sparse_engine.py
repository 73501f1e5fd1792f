"""Large-m sparse Schur path: sparse ADA + tile-supernodal Cholesky + PCG.

Reference analog: the L3/L4 sparse pipeline the reference uses whenever the
Schur complement has exploitable structure —
  getsymbada.m:41-60   symbolic ADA pattern (once),
  symbchol.m:62-83     MMD ordering + supernodal symbolic factor (once),
  getada1/2.c          per-iteration sparse ADA values (LP + Lorentz),
  blkchol.c            supernodal LDL' with add/skip robustness,
  getdense.m:41-99     dense-column detection,
  deninfac.m/dpr1fact.c  product-form rank-1 handling of dense columns,
  wrapPcg.m/loopPcg.m  PCG with the (inexact) factor as preconditioner.

TPU-first redesign: the symbolic phase runs ONCE on the host and produces
static plan arrays; every per-iteration quantity is a segment-sum /
scatter / batched-tile kernel on device, fully inside the jitted IPM step:

* ADA values: every diagonal-scaled column contribution sigma_e a_e a_e'
  becomes precomputed pair-triples (dst nz, weight slot, A_ie * A_je);
  values = segment_sum(prod * w[slot], dst).  The per-iteration weight
  vector w packs d_l (LP) and -eta2*jsign (Lorentz J-part).
* Lorentz rank-1 terms 2 eta2_c (A wb_c)(A wb_c)': u vectors by segment
  sum, then pair-triples over each cone's constraint support.
* Factorization: sparse_chol.factor_tiles (batched BxB tiles, one
  fori_loop, diag-add robustness) on the AMD-permuted pattern.
* Dense columns (getdense.m quantile rule) are pulled OUT of the pattern
  and handled by a Woodbury/capacitance solve: M = F + Ud diag(sd) Ud',
  C = diag(1/sd) + Ud' F^{-1} Ud factored by chol.ldl_masked — the exact
  add/skip pivot semantics of blkchol.c/dpr1fact.c, reachable through
  pars.chol.* (the Lorentz trace column makes sd negative, hence the
  indefinite-safe LDL', matching dpr1fact.c:97-360's signed rank-1s).
* Solves: Woodbury direct solve as preconditioner inside pcg.pcg with
  pars.cg.{maxiter,restol,stagtol} and double-double accumulation
  (cg.qprec), against the EXACT matvec  v -> A H A' v  done matrix-free
  with the COO operator (wrapPcg.m:65-129 economics).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from . import sparse_chol
from .chol import LdlFactor, ldl_masked, ldl_solve
from .cones import Layout
from .params import Pars
from .pcg import pcg
from .structs import ConeVec


@jax.tree_util.register_pytree_node_class
class SparseLqOp:
    """Fully sparse operator + per-iteration plan for LP/SOC problems.

    Doubles as the `aop` passed to ipm.make_step (apply/adj/adj_y) and as
    the data bundle for TileSchurEngine.prepare.  All index arrays are
    device int32; all static shape information lives in `meta`.
    """

    ARRAY_FIELDS = (
        # augmented [A; c'] COO over the internal flat vector (l, q, then
        # PSD buckets in bucket-local symmetrized coordinates)
        "a_row", "a_col", "a_val",
        # diag-weight pair triples -> ADA lower nz values
        "pr_dst", "pr_w", "pr_prod",
        # Lorentz rank-1: u = segsum(u_val * wb_flat[u_wb], u_pos)
        "u_pos", "u_wb", "u_val",
        # rank-1 pairs: vals[dst] += 2 eta2_flat[p2_c] u[a] u[b]
        "p2_dst", "p2_a", "p2_b", "p2_c",
        # dense columns: static base values + weight slots (+ u columns)
        "ud_base", "ud_w",
        # scatter of each u-flat entry of DENSE cones into Ud: Ud[udu_row,
        # udu_col] += udu_val * wb_flat[udu_wb]
        "udu_row", "udu_col", "udu_wb", "udu_val",
        # 2*eta2 slots of dense-cone rank-1 columns (-1 -> use ud_w)
        "ud_r1c",
        # assembly: ADA lower nz -> flat tile-storage index, + identity pad
        "asm", "pad_idx",
        # tile plan arrays (sparse_chol.TilePlan fields)
        "dslot", "oslot", "omask", "pa", "pb", "pdst", "pmask", "orow",
        "lv_cols", "lv_cmask",
        # permutation (new->old) and inverse, device copies
        "perm", "iperm",
    )
    # per-PSD-bucket arrays (tuples, one entry per bucket in layout order):
    #  sg_*   -- (constraint, block) groups for the scaled-operator build
    #            B~_g = W_blk A_i^blk W_blk  (padded [G, pad2] index/value)
    #  sp_*   -- pair gathers  vals[sp_dst] += B~flat[sp_g, sp_loc] * sp_val
    #            (the getada3.c per-pair incremental product, sparse output)
    TUPLE_FIELDS = ("sg_blk", "sg_p", "sg_q", "sg_v",
                    "sp_dst", "sp_g", "sp_loc", "sp_val")

    def __init__(self, arrays: dict, meta: dict):
        self.arrays = dict(arrays)
        self.meta = dict(meta)

    def tree_flatten(self):
        children = (tuple(self.arrays[k] for k in self.ARRAY_FIELDS)
                    + tuple(tuple(self.arrays[k]) for k in self.TUPLE_FIELDS))
        return children, tuple(sorted(self.meta.items()))

    @classmethod
    def tree_unflatten(cls, aux, children):
        names = cls.ARRAY_FIELDS + cls.TUPLE_FIELDS
        return cls(dict(zip(names, children)), dict(aux))

    # --- operator interface -------------------------------------------------
    @property
    def m(self) -> int:
        return self.meta["m"]

    def _flatten_cv(self, x: ConeVec) -> jax.Array:
        parts = ([x.l] + [a.reshape(-1) for a in x.q]
                 + [a.reshape(-1) for a in x.s])
        return jnp.concatenate(parts) if parts else x.l

    def _unflatten_cv(self, flat: jax.Array) -> ConeVec:
        nl = self.meta["nl"]
        l = flat[:nl]
        q = []
        off = nl
        for (c, d) in self.meta["q_shapes"]:
            q.append(flat[off:off + c * d].reshape(c, d))
            off += c * d
        s = []
        for (k, d) in self.meta["s_shapes"]:
            s.append(flat[off:off + k * d * d].reshape(k, d, d))
            off += k * d * d
        return ConeVec(l=l, q=tuple(q), s=tuple(s))

    def apply(self, x: ConeVec) -> jax.Array:
        xf = self._flatten_cv(x)
        contrib = self.arrays["a_val"] * xf[self.arrays["a_col"]]
        return jax.ops.segment_sum(
            contrib, self.arrays["a_row"], num_segments=self.m + 1,
            indices_are_sorted=True)

    def adj(self, w: jax.Array) -> ConeVec:
        vw = self.arrays["a_val"] * w[self.arrays["a_row"]]
        flat = jax.ops.segment_sum(vw, self.arrays["a_col"],
                                   num_segments=self.meta["nflat"])
        return self._unflatten_cv(flat)

    def adj_y(self, y: jax.Array, minus_tau: jax.Array) -> ConeVec:
        w = jnp.concatenate([y, jnp.reshape(minus_tau, (1,))])
        return self.adj(w)


class TileCtx(NamedTuple):
    L: jax.Array            # tile factor storage
    Ud: jax.Array           # [m, Kd] dense columns (zeros when Kd=0)
    sd: jax.Array           # [Kd] signed weights
    Z: jax.Array            # [m, Kd] = F^{-1} Ud
    CL: jax.Array           # LDL' L of the capacitance matrix
    Cd: jax.Array           # LDL' d
    hx: ConeVec             # H c (reused by matvec-free ahc)
    S: object               # NT scaling (for the exact matvec)


@dataclass
class TileSchurEngine:
    """prepare/solve backend over SparseLqOp (plugs into ipm.make_step).

    One instance per jitted step function: prepare() stashes trace-local
    closures (the tile solve and the traced operator) that solve() reuses
    within the same trace.
    """

    pars: Pars

    def prepare(self, aop: SparseLqOp, S, reg):
        meta = aop.meta
        m = meta["m"]
        nnz_l = meta["nnz_l"]
        arr = aop.arrays
        dtype = arr["a_val"].dtype

        # --- per-iteration weight vector ---------------------------------
        wparts = [S.d_l]
        for eta2, (c, d) in zip(S.q_eta2, meta["q_shapes"]):
            jsign = jnp.ones(d, dtype).at[1:].set(-1.0)
            wparts.append((-eta2[:, None] * jsign[None, :]).reshape(-1))
        w = jnp.concatenate(wparts) if wparts else jnp.zeros(0, dtype)

        # --- sparse ADA values --------------------------------------------
        vals = jax.ops.segment_sum(
            arr["pr_prod"] * w[arr["pr_w"]], arr["pr_dst"],
            num_segments=nnz_l)
        eta2_flat = (jnp.concatenate(S.q_eta2)
                     if S.q_eta2 else jnp.zeros(0, dtype))
        if meta["n_uflat"]:
            wb_flat = jnp.concatenate([a.reshape(-1) for a in S.q_wb])
            u = jax.ops.segment_sum(
                arr["u_val"] * wb_flat[arr["u_wb"]], arr["u_pos"],
                num_segments=meta["n_uflat"])
            vals = vals + jax.ops.segment_sum(
                2.0 * eta2_flat[arr["p2_c"]] * u[arr["p2_a"]] * u[arr["p2_b"]],
                arr["p2_dst"], num_segments=nnz_l)

        # --- PSD contributions (getada3.c + spscale.c economics, sparse
        # output): per bucket, build B~_g = W_blk A_i^blk W_blk for every
        # (constraint, block) incidence group as batched outer-product
        # GEMMs, then gather per lower-nz pair
        #   M[i,j] += sum_t v_t(A_gather) * B~[g(other)][p_t, q_t].
        for bi, (k, d) in enumerate(meta["s_shapes"]):
            G = meta["s_G"][bi]
            if not G:
                continue
            r = S.s_r[bi]
            W = jnp.einsum("kab,kcb->kac", r, r)            # [k,d,d]
            gblk = arr["sg_blk"][bi]
            gp, gq, gv = arr["sg_p"][bi], arr["sg_q"][bi], arr["sg_v"][bi]
            pad2 = gp.shape[1]
            # chunk groups so the [g, pad2, d] temporaries stay bounded
            gchunk = max(1, int(6e7 // max(pad2 * d, 1)))
            Bgf = jnp.zeros((G, d * d), dtype)
            for st in range(0, G, gchunk):
                en = min(st + gchunk, G)
                blkc = gblk[st:en]
                wp = W[blkc[:, None], :, gp[st:en]] * gv[st:en][..., None]
                wq = W[blkc[:, None], gq[st:en], :]
                bg = jnp.einsum("gtd,gte->gde", wp, wq)      # [g,d,d]
                Bgf = jax.lax.dynamic_update_slice(
                    Bgf, bg.reshape(en - st, d * d), (st, 0))
            vals = vals + jax.ops.segment_sum(
                Bgf[arr["sp_g"][bi], arr["sp_loc"][bi]] * arr["sp_val"][bi],
                arr["sp_dst"][bi], num_segments=nnz_l)

        # --- assemble + tile factorization --------------------------------
        B = meta["B"]
        nslot = meta["nslot"]
        flat = jnp.zeros(nslot * B * B, dtype)
        flat = flat.at[arr["asm"]].add(vals)
        if meta["npad"]:
            flat = flat.at[arr["pad_idx"]].add(1.0)
        storage = flat.reshape(nslot, B, B)
        # exact-shape unrolled level kernels when the schedule is shallow
        # (the padded fori version costs nlev*maxc*maxp tile-ops; measured
        # 277 s/factorization at m=20480 — see sparse_chol.factor_tiles_ur)
        lvl = meta.get("lv_lists", ())
        use_ur = bool(lvl) and len(lvl) <= 64
        if use_ur:
            L = sparse_chol.factor_tiles_ur(
                storage, arr["dslot"], arr["oslot"], arr["omask"],
                arr["pa"], arr["pb"], arr["pdst"], arr["pmask"], lvl,
                jnp.asarray(reg, dtype),
                canceltol=self.pars.chol.canceltol)
        else:
            L = sparse_chol.factor_tiles_lv(
                storage, arr["dslot"], arr["oslot"], arr["omask"], arr["pa"],
                arr["pb"], arr["pdst"], arr["pmask"], arr["lv_cols"],
                jnp.asarray(reg, dtype), meta["nlev"],
                canceltol=self.pars.chol.canceltol)
        ok = jnp.all(jnp.isfinite(L))

        def fsolve(b_m):
            bp = jnp.zeros(meta["ntiles_n"], dtype).at[
                jnp.arange(m)].set(b_m[arr["perm"]])
            if use_ur:
                x = sparse_chol.solve_tiles_ur(
                    L, bp, arr["dslot"], arr["oslot"], arr["omask"],
                    arr["orow"], lvl, meta["ntiles_n"] // B)
            else:
                x = sparse_chol.solve_tiles_lv(
                    L, bp, arr["dslot"], arr["oslot"], arr["omask"],
                    arr["orow"], arr["lv_cols"], arr["lv_cmask"],
                    meta["nlev"])
            return x[:m][arr["iperm"]]

        # --- dense columns: Woodbury/capacitance --------------------------
        Kd = meta["Kd"]
        if Kd:
            Ud = arr["ud_base"]
            if meta["n_udu"]:
                wb_flat = jnp.concatenate([a.reshape(-1) for a in S.q_wb])
                Ud = Ud.at[arr["udu_row"], arr["udu_col"]].add(
                    arr["udu_val"] * wb_flat[arr["udu_wb"]])
            if eta2_flat.size:
                sd = jnp.where(arr["ud_r1c"] >= 0,
                               2.0 * eta2_flat[jnp.maximum(arr["ud_r1c"], 0)],
                               w[arr["ud_w"]])
            else:
                sd = w[arr["ud_w"]]
            Z = jax.vmap(fsolve, in_axes=1, out_axes=1)(Ud)
            C = jnp.diag(1.0 / sd) + Ud.T @ Z
            # maxuden: the dense-column (product-form) growth bound
            # (checkpars.m:145-168 keeps it separate from the sparse-factor
            # maxu; dpr1fact.c applies it to the rank-1 chain)
            fC = ldl_masked(C, canceltol=self.pars.chol.canceltol,
                            maxu=self.pars.chol.maxuden,
                            abstol=self.pars.chol.abstol,
                            skip_pivots=bool(self.pars.chol.skip))
            CL, Cd = fC.L, fC.d
            ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(CL)))
        else:
            Ud = jnp.zeros((m, 0), dtype)
            sd = jnp.zeros((0,), dtype)
            Z = Ud
            CL = jnp.zeros((0, 0), dtype)
            Cd = sd

        # --- augmented column: ahc = A Hc, chc = c'Hc ---------------------
        from . import nt as _nt

        e_m = jnp.zeros(m + 1, dtype).at[m].set(1.0)
        c_cv = aop.adj(e_m)
        hc = _nt.H_apply(S, c_cv)
        af = aop.apply(hc)
        ctx = TileCtx(L=L, Ud=Ud, sd=sd, Z=Z, CL=CL, Cd=Cd, hx=hc, S=S)
        self._aop = aop       # used by solve's matvec (same trace)
        self._fsolve = fsolve
        return ctx, af[:m], af[m], ok

    def _direct(self, ctx: TileCtx, rhs):
        x0 = self._fsolve(rhs)
        if ctx.Ud.shape[1]:
            t = ctx.Ud.T @ x0
            wv = ldl_solve(
                LdlFactor(L=ctx.CL, d=ctx.Cd,
                          skip=jnp.zeros(ctx.Cd.shape, bool),
                          diagadd=jnp.zeros_like(ctx.Cd)), t)
            x0 = x0 - ctx.Z @ wv
        return x0

    def solve(self, ctx: TileCtx, rhs):
        from . import nt as _nt

        aop = self._aop
        m = aop.m
        dtype = rhs.dtype

        def matvec(v):
            w = jnp.concatenate([v, jnp.zeros(1, dtype)])
            t = aop.adj(w)
            ht = _nt.H_apply(ctx.S, t)
            return aop.apply(ht)[:m]

        x0 = self._direct(ctx, rhs)
        cg = self.pars.cg
        # pars.cg.restol keeps the reference's semantics (wrapPcg.m:46):
        # the acceptance is ABSOLUTE, restol * y0 where y0 is the iterate's
        # residual scale — here approximated by mu = mean(lam^2) of the NT
        # scaled point (both decay to 0 along the central path).  A fixed
        # relative floor of 1e-9 * ||rhs|| keeps the endgame directions
        # accurate once mu is below roundoff scale.
        S = ctx.S
        lam2 = (jnp.vdot(S.lam_l, S.lam_l)
                + sum(jnp.vdot(q, q) for q in S.q_lam)
                + sum(jnp.vdot(sg, sg) for sg in S.s_lam))
        nspec = (S.lam_l.size + sum(q.size for q in S.q_lam)
                 + sum(sg.size for sg in S.s_lam))
        mu = lam2 / max(nspec, 1)
        res = pcg(matvec, lambda r: self._direct(ctx, r), rhs, x0,
                  maxiter=int(cg.maxiter), restol=1e-9,
                  abstol=float(cg.restol) * mu,
                  stagtol=float(cg.stagtol))
        return res.x


def plan_sparse_lq(At: sp.spmatrix, c: np.ndarray, layout: Layout,
                   pars: Pars, B: int = 128) -> tuple[dict, dict]:
    """Host symbolic phase: ONE pass producing all static plan arrays.

    Returns (arrays, meta) in numpy; instantiate per dtype/device with
    make_sparse_lq_op.  Reference analogs: getsymbada.m (pattern),
    getdense.m (dense columns), symbchol.m (ordering + symbolic factor),
    and the value-gather maps replacing getada1/2.c's runtime loops.
    """
    N, m = At.shape
    assert N == layout.N
    aug0 = sp.hstack([sp.csc_matrix(At),
                      sp.csc_matrix(np.asarray(c, np.float64).reshape(-1, 1))]
                     ).T.tocsc()          # [m+1, N] csc: fast column access
    nl = layout.l
    nq = int(sum(layout.q))
    q_shapes = tuple((b.count, b.dim) for b in layout.q_buckets)
    s_shapes = tuple((b.count, b.dim) for b in layout.s_buckets)
    q_offs = layout.q_offsets()           # flat start of each layout block
    # PSD columns: reorder to bucket-local flat and symmetrize per block
    # (X -> (X+X')/2 in the d x d coordinates, the vecsym.c role) so the
    # operator's adjoint lands symmetric s blocks and Schur pair products
    # see both triangles.
    s_offs = layout.s_offsets()
    aug_parts = [aug0[:, :nl + nq]]
    for b in layout.s_buckets:
        k, d = b.count, b.dim
        cols = (np.concatenate([s_offs[i] + np.arange(d * d)
                                for i in b.block_ids])
                if k else np.zeros(0, np.int64))
        sub = aug0[:, cols].tocoo()
        loc = sub.col.astype(np.int64)
        blk = loc // (d * d)
        p = (loc % (d * d)) // d
        qq = loc % d
        M2 = sp.coo_matrix(
            (np.concatenate([sub.data, sub.data]) * 0.5,
             (np.concatenate([sub.row, sub.row]),
              np.concatenate([blk, blk]) * d * d
              + np.concatenate([p, qq]) * d + np.concatenate([qq, p]))),
            shape=(m + 1, k * d * d)).tocsr()
        M2.sum_duplicates()
        aug_parts.append(M2)
    aug = sp.hstack(aug_parts).tocsc() if len(aug_parts) > 1 else aug0

    def col_support(j):
        sl = slice(aug.indptr[j], aug.indptr[j + 1])
        rows = aug.indices[sl]
        vals = aug.data[sl]
        keep = rows < m                   # the c row never enters ADA
        return rows[keep].astype(np.int64), vals[keep]

    # --- group structure: LP cols, then cones bucket-major -----------------
    # weight slots: [0, nl) LP; [nl, nl+sum(c*d)) Lorentz J-part (bucket
    # major, cone major, component minor) — must match prepare()'s concat.
    wq_off = [nl]
    r1_off = [0]
    for (cnt, d) in q_shapes:
        wq_off.append(wq_off[-1] + cnt * d)
        r1_off.append(r1_off[-1] + cnt)

    lp_groups = []                        # (wslot, rows, vals)
    for k in range(nl):
        rows, vals = col_support(k)
        if rows.size:
            lp_groups.append((k, rows, vals))

    cone_groups = []   # (flat_cone, wslots[d], col_ids[d], union_rows, ...)
    for bi, b in enumerate(layout.q_buckets):
        d = b.dim
        for ci, blk in enumerate(b.block_ids):
            base = int(q_offs[blk])
            cols = [col_support(base + j) for j in range(d)]
            union = np.unique(np.concatenate([r for r, _ in cols])) \
                if any(r.size for r, _ in cols) else np.zeros(0, np.int64)
            if union.size == 0:
                continue
            cone_groups.append(dict(
                flat_cone=r1_off[bi] + ci,
                wslot0=wq_off[bi] + ci * d,
                wb0=wq_off[bi] - nl + ci * d,   # wb_flat offset
                base_col=base, d=d, cols=cols, union=union,
            ))

    # --- PSD incidences: (constraint, block) groups per bucket -------------
    # Reference analog: findblks.c (which PSD blocks each constraint
    # touches) + incorder.c's grouping; pattern-wise every block's touching
    # set is a clique in ADA (getsymbada.m:41-60 behavior), since
    # <A_i, W A_j W> is generically nonzero whenever i and j share a block.
    s_host = []
    s_col0 = nl + nq
    for bi, b in enumerate(layout.s_buckets):
        k, d = b.count, b.dim
        ncols = k * d * d
        sub = aug[:, s_col0:s_col0 + ncols].tocoo()
        s_col0 += ncols
        keep = sub.row < m                # the c row never enters ADA
        rows_s = sub.row[keep].astype(np.int64)
        loc_s = sub.col[keep].astype(np.int64)
        val_s = sub.data[keep]
        blk = loc_s // (d * d)
        pq = loc_s % (d * d)
        keys = rows_s * k + blk
        order = np.argsort(keys, kind="stable")
        rows_o, blk_o = rows_s[order], blk[order]
        pq_o, val_o = pq[order], val_s[order]
        T = rows_o.size
        uk, start = (np.unique(keys[order], return_index=True)
                     if T else (np.zeros(0, np.int64), np.zeros(0, np.int64)))
        counts_g = np.diff(np.concatenate([start, [T]]))
        G = uk.size
        pad2 = int(counts_g.max()) if G else 1
        gp_a = np.zeros((G, pad2), np.int32)
        gq_a = np.zeros((G, pad2), np.int32)
        gv_a = np.zeros((G, pad2), np.float64)
        if G:
            gidx = np.repeat(np.arange(G), counts_g)
            posg = np.arange(T) - np.repeat(start, counts_g)
            gp_a[gidx, posg] = (pq_o // d).astype(np.int32)
            gq_a[gidx, posg] = (pq_o % d).astype(np.int32)
            gv_a[gidx, posg] = val_o
        s_host.append(dict(
            k=k, d=d, G=int(G), pad2=pad2,
            g_row=rows_o[start], g_blk=blk_o[start].astype(np.int32),
            gp=gp_a, gq=gq_a, gv=gv_a,
            counts=counts_g, start=start, pq=pq_o, val=val_o))

    # --- dense-column detection (getdense.m:41-99 quantile rule) -----------
    counts = np.array([r.size for _, r, _ in lp_groups]
                      + [g["union"].size for g in cone_groups], np.int64)
    dense_lp: set[int] = set()
    dense_cone: set[int] = set()
    if counts.size and pars.denf > 0:
        dq = np.quantile(counts, min(max(pars.denq, 0.0), 1.0))
        thr = pars.denf * max(dq, 2.0)
        dense_ids = np.nonzero(counts > thr)[0]
        # the reference abandons when more than m/2 columns are dense
        ncols_dense = 0
        for gi in dense_ids:
            ncols_dense += 1 if gi < len(lp_groups) \
                else 1 + cone_groups[gi - len(lp_groups)]["d"]
        if ncols_dense <= m / 2:
            for gi in dense_ids:
                if gi < len(lp_groups):
                    dense_lp.add(gi)
                else:
                    dense_cone.add(gi - len(lp_groups))

    # --- symbolic ADA pattern over sparse groups ----------------------------
    rows_inc, cols_inc = [], []
    gid = 0
    for gi, (_, rows, _) in enumerate(lp_groups):
        if gi in dense_lp:
            continue
        rows_inc.append(rows)
        cols_inc.append(np.full(rows.size, gid))
        gid += 1
    for ci_, g in enumerate(cone_groups):
        if ci_ in dense_cone:
            continue
        rows_inc.append(g["union"])
        cols_inc.append(np.full(g["union"].size, gid))
        gid += 1
    for bh in s_host:
        # every PSD block's touching-constraint set is one pattern clique
        for bk in np.unique(bh["g_blk"]):
            members = bh["g_row"][bh["g_blk"] == bk]
            rows_inc.append(members)
            cols_inc.append(np.full(members.size, gid))
            gid += 1
    if rows_inc:
        inc = sp.csr_matrix(
            (np.ones(sum(r.size for r in rows_inc), np.int8),
             (np.concatenate(rows_inc), np.concatenate(cols_inc))),
            shape=(m, gid))
        pattern = (inc @ inc.T).tocoo()
        pattern = sp.coo_matrix(
            (np.ones(pattern.nnz, np.int8), (pattern.row, pattern.col)),
            shape=(m, m))
    else:
        pattern = sp.coo_matrix((m, m))
    pattern = (pattern + sp.eye(m, format="coo", dtype=np.int8)).tocsc()
    pattern.data[:] = 1

    # --- tile plan + lower-triangle nz numbering ----------------------------
    plan = sparse_chol.plan_tiles(pattern, B=B)
    iperm0 = np.empty(m, np.int64)
    iperm0[plan.perm] = np.arange(m)
    pat_l = sp.tril(pattern).tocoo()
    nz_i = pat_l.row.astype(np.int64)
    nz_j = pat_l.col.astype(np.int64)
    nnz_l = nz_i.size
    nzid = {(int(i), int(j)): t for t, (i, j) in enumerate(zip(nz_i, nz_j))}

    pi, pj = iperm0[nz_i], iperm0[nz_j]
    r = np.maximum(pi, pj)
    cc = np.minimum(pi, pj)
    slot = np.asarray([plan.slot_of[(int(a) // B, int(b) // B)]
                       for a, b in zip(r, cc)], np.int64)
    asm = slot * (B * B) + (r % B) * B + (cc % B)
    pad = np.arange(m, plan.n)
    pad_slot = np.asarray([plan.slot_of[(int(i) // B, int(i) // B)]
                           for i in pad], np.int64)
    pad_idx = pad_slot * (B * B) + (pad % B) * B + (pad % B)

    # --- pair triples --------------------------------------------------------
    pr_dst, pr_w, pr_prod = [], [], []

    def add_pairs(rows, vals, wslot):
        s = rows.size
        ia, ib = np.triu_indices(s)       # a <= b; rows sorted asc -> i>=j
        pr_dst.append(np.asarray(
            [nzid[(int(rows[b]), int(rows[a]))] for a, b in zip(ia, ib)],
            np.int64))
        pr_w.append(np.full(ia.size, wslot, np.int64))
        pr_prod.append(vals[ia] * vals[ib])

    for gi, (k, rows, vals) in enumerate(lp_groups):
        if gi not in dense_lp:
            add_pairs(rows, vals, k)

    u_pos, u_wb, u_val = [], [], []
    p2_dst, p2_a, p2_b, p2_c = [], [], [], []
    uoff = 0
    for ci_, g in enumerate(cone_groups):
        if ci_ in dense_cone:
            continue
        union = g["union"]
        pos_of = {int(rr): t for t, rr in enumerate(union)}
        for j, (rows, vals) in enumerate(g["cols"]):
            if rows.size:
                add_pairs(rows, vals, g["wslot0"] + j)
                u_pos.append(np.asarray([uoff + pos_of[int(rr)] for rr in rows],
                                        np.int64))
                u_wb.append(np.full(rows.size, g["wb0"] + j, np.int64))
                u_val.append(vals)
        s = union.size
        ia, ib = np.triu_indices(s)
        p2_dst.append(np.asarray(
            [nzid[(int(union[b]), int(union[a]))] for a, b in zip(ia, ib)],
            np.int64))
        p2_a.append(uoff + ia)
        p2_b.append(uoff + ib)
        p2_c.append(np.full(ia.size, g["flat_cone"], np.int64))
        uoff += s

    # --- PSD pair gathers ----------------------------------------------------
    # For each lower nz (i,j) and shared block: gather the SMALLER side's
    # entries against the other side's scaled operator B~ (both orders give
    # <A_i, W A_j W>; picking the sparser gather side halves the work —
    # the sortnnz.c economics).
    def cat(parts, dt):
        return (np.concatenate(parts).astype(dt) if parts
                else np.zeros(0, dt))

    sg_blk_b, sg_p_b, sg_q_b, sg_v_b = [], [], [], []
    sp_dst_b, sp_g_b, sp_loc_b, sp_val_b = [], [], [], []
    for bh in s_host:
        dsts, ggs, lls, vvs = [], [], [], []
        gb = bh["g_blk"]
        gr = bh["g_row"]
        cnt = bh["counts"]
        st_ = bh["start"]
        for bk in np.unique(gb):
            gis = np.nonzero(gb == bk)[0]
            for ai in range(gis.size):
                for bj in range(ai, gis.size):
                    g1, g2 = int(gis[ai]), int(gis[bj])
                    r1, r2 = int(gr[g1]), int(gr[g2])
                    gat, oth = (g1, g2) if cnt[g1] <= cnt[g2] else (g2, g1)
                    sl = slice(int(st_[gat]), int(st_[gat] + cnt[gat]))
                    n_t = int(cnt[gat])
                    dsts.append(np.full(
                        n_t, nzid[(max(r1, r2), min(r1, r2))], np.int64))
                    ggs.append(np.full(n_t, oth, np.int64))
                    lls.append(bh["pq"][sl])
                    vvs.append(bh["val"][sl])
        sg_blk_b.append(bh["g_blk"])
        sg_p_b.append(bh["gp"])
        sg_q_b.append(bh["gq"])
        sg_v_b.append(bh["gv"])
        sp_dst_b.append(cat(dsts, np.int32))
        sp_g_b.append(cat(ggs, np.int32))
        sp_loc_b.append(cat(lls, np.int32))
        sp_val_b.append(cat(vvs, np.float64))

    # --- dense columns -> Woodbury bundle -----------------------------------
    ud_cols = []       # (static base values over rows<m, wslot, r1c, udu?)
    udu = []           # (row, colidx, wb_slot, val) for per-iteration u cols
    for gi in sorted(dense_lp):
        k, rows, vals = lp_groups[gi]
        base = np.zeros(m)
        base[rows] = vals
        ud_cols.append((base, k, -1))
    for ci_ in sorted(dense_cone):
        g = cone_groups[ci_]
        for j, (rows, vals) in enumerate(g["cols"]):
            base = np.zeros(m)
            base[rows] = vals
            ud_cols.append((base, g["wslot0"] + j, -1))
        ucol_idx = len(ud_cols)
        for j, (rows, vals) in enumerate(g["cols"]):
            for rr, vv in zip(rows, vals):
                udu.append((int(rr), ucol_idx, g["wb0"] + j, float(vv)))
        ud_cols.append((np.zeros(m), 0, g["flat_cone"]))

    aug_coo = aug.tocoo()
    order = np.argsort(aug_coo.row, kind="stable")
    arrays = dict(
        a_row=aug_coo.row[order].astype(np.int32),
        a_col=aug_coo.col[order].astype(np.int32),
        a_val=aug_coo.data[order].astype(np.float64),
        pr_dst=cat(pr_dst, np.int32), pr_w=cat(pr_w, np.int32),
        pr_prod=cat(pr_prod, np.float64),
        u_pos=cat(u_pos, np.int32), u_wb=cat(u_wb, np.int32),
        u_val=cat(u_val, np.float64),
        p2_dst=cat(p2_dst, np.int32), p2_a=cat(p2_a, np.int32),
        p2_b=cat(p2_b, np.int32), p2_c=cat(p2_c, np.int32),
        ud_base=(np.stack([b for b, _, _ in ud_cols], axis=1)
                 if ud_cols else np.zeros((m, 0))),
        ud_w=np.asarray([w_ for _, w_, _ in ud_cols], np.int32),
        ud_r1c=np.asarray([r1 for _, _, r1 in ud_cols], np.int32),
        udu_row=np.asarray([t[0] for t in udu], np.int32),
        udu_col=np.asarray([t[1] for t in udu], np.int32),
        udu_wb=np.asarray([t[2] for t in udu], np.int32),
        udu_val=np.asarray([t[3] for t in udu], np.float64),
        asm=asm, pad_idx=pad_idx,
        dslot=np.asarray(plan.dslot), oslot=np.asarray(plan.oslot),
        omask=np.asarray(plan.omask), pa=np.asarray(plan.pa),
        pb=np.asarray(plan.pb), pdst=np.asarray(plan.pdst),
        pmask=np.asarray(plan.pmask), orow=np.asarray(plan.orow),
        lv_cols=np.asarray(plan.lv_cols), lv_cmask=np.asarray(plan.lv_cmask),
        perm=plan.perm.astype(np.int32), iperm=iperm0.astype(np.int32),
        sg_blk=tuple(sg_blk_b), sg_p=tuple(sg_p_b), sg_q=tuple(sg_q_b),
        sg_v=tuple(sg_v_b),
        sp_dst=tuple(sp_dst_b), sp_g=tuple(sp_g_b), sp_loc=tuple(sp_loc_b),
        sp_val=tuple(sp_val_b),
    )
    meta = dict(
        m=m, nl=nl,
        nflat=nl + int(sum(layout.q)) + int(sum(
            k_ * d_ * d_ for (k_, d_) in s_shapes)),
        q_shapes=q_shapes, s_shapes=s_shapes,
        s_G=tuple(bh["G"] for bh in s_host),
        nnz_l=int(nnz_l), n_uflat=int(uoff), Kd=len(ud_cols),
        n_udu=len(udu), B=B, ntc=plan.ntc, nslot=plan.nslot,
        ntiles_n=plan.n, npad=int(plan.n - m), nlev=plan.nlev,
        lv_lists=plan.lv_lists,
        ada_nnz=int(pattern.nnz), ada_density=float(pattern.nnz) / max(m * m, 1),
        psd_pair_entries=int(sum(a.size for a in sp_val_b)),
    )
    return arrays, meta


def make_sparse_lq_op(arrays: dict, meta: dict, dtype=np.float64,
                      device=None) -> SparseLqOp:
    """Instantiate device arrays for one dtype/device from a host plan."""
    _place = (lambda a: jax.device_put(a, device)) if device is not None \
        else jnp.asarray
    float_fields = {"a_val", "pr_prod", "u_val", "ud_base", "udu_val",
                    "sg_v", "sp_val"}
    out = {}
    for k in SparseLqOp.TUPLE_FIELDS:
        parts = arrays[k]
        out[k] = tuple(
            _place(np.asarray(a, dtype) if k in float_fields else a)
            for a in parts)
    for k in SparseLqOp.ARRAY_FIELDS:
        a = arrays[k]
        if k in float_fields:
            a = np.asarray(a, dtype)
        out[k] = _place(a)
    meta = dict(meta)
    meta["q_shapes"] = tuple(tuple(s) for s in meta["q_shapes"])
    meta["s_shapes"] = tuple(tuple(s) for s in meta["s_shapes"])
    meta["s_G"] = tuple(meta["s_G"])
    return SparseLqOp(out, meta)
