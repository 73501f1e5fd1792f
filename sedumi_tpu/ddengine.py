"""Double-double Schur engine: the `dd64` endgame phase's linear solver.

Role in the reference's terms: the final escalation rung of the
"never-fail" solve chain (blkchol.c add/skip -> PCG with quad
accumulation, wrapPcg.m:94-130) — but where the reference's quad
precision only compensates the CG *accumulation*, this engine carries
the whole Schur pipeline in double-double (ddlinalg: Ozaki split-GEMM
formation, dd Cholesky, dd triangular solves with one dd refinement
pass), so Newton directions stay exact-to-f64 up to cond(ADA) ~ 1e30.

Why it exists: cond(ADA) ~ 1/mu^2 crosses 1/eps_f64 around mu ~ 1e-8,
and from there every f64-formed-and-factored direction carries O(1)
defects — the measured 1e-7 terminal floor and the round-4 numerr=1
grades on arch0/control07/trto3.  Degenerate problems (arch0: middle
eigenpairs x~4e-4, z~4e-5 unresolved at mu=8e-10) additionally need
mu ~ 1e-12 before the optimal face is even identifiable; only exact
directions get there.

Device integration: the engine's prepare/solve run as
jax.pure_callback's inside the jitted step on the HOST CPU backend
(the dd64 phase is host-resident by construction; m <= O(10^3), so a
dd factorization costs ~0.1-1 s and each solve ~10-40 ms).

The SOC Schur contribution stays f64 (formed by the same formulas as
schur.build_schur, in numpy): cond-critical endgames on the bundled
set are PSD/LP-dominated, and the dd LP+PSD terms are where the 1e-7
floor measurably came from.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import ddlinalg as dd


def _form_dd(Al, d_l, aq_list, q_shapes, wb_list, eta2_list,
             as_list, s_shapes, r_list, reg):
    """Host: the augmented Schur complement as a dd pair (Mh, Ml)."""
    mp1 = Al.shape[0] if Al.size else (
        as_list[0].shape[0] if as_list else aq_list[0].shape[0])
    Mh = np.zeros((mp1, mp1))
    Ml = np.zeros((mp1, mp1))

    def acc(Ph, Pl):
        nonlocal Mh, Ml
        Mh, Ml = dd.dd_add(Mh, Ml, Ph, Pl if Pl is not None
                           else np.zeros_like(Ph))

    if Al.size and Al.shape[1]:
        Wh, Wl = dd.two_prod(Al, d_l[None, :])
        acc(*dd.dd_gemm(Wh, Wl, Al.T, None))
    # SOC contribution in f64 (schur.build_schur formulas)
    for aq, (cnt, d_), wb, eta2 in zip(aq_list, q_shapes, wb_list,
                                       eta2_list):
        aq3 = aq.reshape(mp1, cnt, d_)
        u = np.einsum("mcd,cd->mc", aq3, wb)
        acc(2.0 * np.einsum("mc,c,nc->mn", u, eta2, u), None)
        jsign = np.ones(d_)
        jsign[1:] = -1.0
        w = (eta2[:, None] * jsign[None, :]).reshape(-1)
        acc(-(aq * w[None, :]) @ aq.T, None)
    # PSD: dd congruence + dd Gram per bucket
    for as_, (k, d_), r in zip(as_list, s_shapes, r_list):
        kdd = k * d_ * d_
        Bh = np.empty((mp1, kdd))
        Bl = np.empty((mp1, kdd))
        for kk in range(k):
            Ak = as_.reshape(mp1, k, d_, d_)[:, kk]          # [mp1, d, d]
            Rk = r[kk]                                       # [d, d]
            Th, Tl = dd.dd_gemm(Ak.reshape(mp1 * d_, d_), None, Rk, None)
            # U = R' T  computed as (T' R)': T' is [d, mp1*d] per row-block
            T3h = Th.reshape(mp1, d_, d_)
            T3l = Tl.reshape(mp1, d_, d_)
            TTh = np.ascontiguousarray(np.swapaxes(T3h, 1, 2)).reshape(
                mp1 * d_, d_)
            TTl = np.ascontiguousarray(np.swapaxes(T3l, 1, 2)).reshape(
                mp1 * d_, d_)
            Uh, Ul = dd.dd_gemm(TTh, TTl, Rk, None)
            U3h = np.swapaxes(Uh.reshape(mp1, d_, d_), 1, 2)
            U3l = np.swapaxes(Ul.reshape(mp1, d_, d_), 1, 2)
            Bh[:, kk * d_ * d_:(kk + 1) * d_ * d_] = U3h.reshape(mp1, -1)
            Bl[:, kk * d_ * d_:(kk + 1) * d_ * d_] = U3l.reshape(mp1, -1)
        acc(*dd.dd_gemm(Bh, Bl, Bh.T, Bl.T))
    if reg != 0.0:
        sc = float(np.trace(Mh)) / max(mp1, 1) + 1.0
        Mh = Mh + (reg * sc) * np.eye(mp1)
    return Mh, Ml


class DdSchurEngine:
    """prepare/solve engine contract (DenseSchurEngine) in double-double.

    All numerics happen in host callbacks; the traced graph only moves
    the operator arrays and factor arrays through pure_callback edges.
    """

    def __init__(self, refine_iters: int = 1):
        self.refine_iters = refine_iters

    def prepare(self, aop, S, reg):
        mp1 = aop.m + 1
        m = aop.m
        dt = jnp.float64

        def host_prepare(Al, d_l, aqs, wbs, eta2s, ass, coos, rs, reg_):
            Al = np.asarray(Al, np.float64)
            # densify COO-represented PSD buckets on the host: the dd
            # congruence needs the full [mp1, k*d*d] block data (memory
            # ~mp1*kdd*8, bounded by the dd64 admission cost model)
            as_full = []
            di = ci = 0
            for kind, (k_, d_) in zip(self._kinds, self._s_shapes):
                if kind == "dense":
                    as_full.append(np.asarray(ass[di], np.float64))
                    di += 1
                else:
                    b_row, b_loc, b_val = coos[ci]
                    ci += 1
                    mat = np.zeros((mp1, k_ * d_ * d_))
                    mat[np.asarray(b_row), np.asarray(b_loc)] = \
                        np.asarray(b_val, np.float64)
                    as_full.append(mat)
            Mh, Ml = _form_dd(
                Al, np.asarray(d_l, np.float64),
                [np.asarray(a, np.float64) for a in aqs], aop.q_shapes,
                [np.asarray(w, np.float64) for w in wbs],
                [np.asarray(e, np.float64) for e in eta2s],
                as_full, self._s_shapes,
                [np.asarray(r, np.float64) for r in rs],
                float(reg_))
            f = dd.dd_chol(Mh[:m, :m], Ml[:m, :m])
            nb = f.nb
            npan = -(-m // nb)
            InvH = np.zeros((npan, nb, nb))
            InvL = np.zeros((npan, nb, nb))
            for i, (ih, il) in enumerate(f.inv_diag):
                InvH[i, :ih.shape[0], :ih.shape[1]] = ih
                InvL[i, :il.shape[0], :il.shape[1]] = il
            return (Mh, Ml, f.Lh, f.Ll, InvH, InvL,
                    np.float64(1.0 if f.ok else 0.0))

        # flatten the PSD arrays depending on the operator flavor; COO
        # buckets travel as triplets and are densified in the callback
        coos: list = []
        if hasattr(aop, "As"):                      # DenseAOp
            ass = list(aop.As)
            self._s_shapes = tuple(aop.s_shapes)
            self._kinds = ("dense",) * len(ass)
        else:                                       # CooAOp
            ass = []
            kinds = []
            sshapes = []
            for part, meta in zip(aop.s_parts, aop.s_meta):
                sshapes.append((meta[1], meta[2]))
                if meta[0] == "dense":
                    ass.append(part["mat"])
                    kinds.append("dense")
                else:
                    coos.append((part["b_row"], part["b_loc"],
                                 part["b_val"]))
                    kinds.append("coo")
            self._s_shapes = tuple(sshapes)
            self._kinds = tuple(kinds)

        nb = 48
        npan = -(-m // nb)
        out_shapes = (
            jax.ShapeDtypeStruct((mp1, mp1), dt),
            jax.ShapeDtypeStruct((mp1, mp1), dt),
            jax.ShapeDtypeStruct((m, m), dt),
            jax.ShapeDtypeStruct((m, m), dt),
            jax.ShapeDtypeStruct((npan, nb, nb), dt),
            jax.ShapeDtypeStruct((npan, nb, nb), dt),
            jax.ShapeDtypeStruct((), dt),
        )
        Mh, Ml, Lh, Ll, InvH, InvL, okf = jax.pure_callback(
            host_prepare, out_shapes,
            aop.Al, S.d_l, list(aop.Aq), list(S.q_wb), list(S.q_eta2),
            ass, coos, list(S.s_r), reg)
        ctx = (Mh, Ml, Lh, Ll, InvH, InvL)
        return ctx, Mh[:m, m], Mh[m, m], okf > 0.5

    def solve(self, ctx, rhs):
        Mh, Ml, Lh, Ll, InvH, InvL = ctx
        m = Lh.shape[0]
        refine = self.refine_iters

        def host_solve(Mh_, Ml_, Lh_, Ll_, InvH_, InvL_, b):
            Mh_ = np.asarray(Mh_)[:m, :m]
            Ml_ = np.asarray(Ml_)[:m, :m]
            f = dd.DdCholFactor(
                np.asarray(Lh_), np.asarray(Ll_),
                [(np.asarray(InvH_)[i], np.asarray(InvL_)[i])
                 for i in range(InvH_.shape[0])], 48, True)
            # trim padded last-panel inverse back to its true width
            last_w = m - (m // 48) * 48 or 48
            ih, il = f.inv_diag[-1]
            f.inv_diag[-1] = (ih[:last_w, :last_w], il[:last_w, :last_w])
            b = np.asarray(b, np.float64)
            xh, xl = dd.dd_chol_solve(f, b)
            for _ in range(refine):
                ph, pl = dd.dd_gemv(Mh_, Ml_, xh, xl)
                rh, rl = dd.dd_sub(b, np.zeros_like(b), ph, pl)
                eh, el = dd.dd_chol_solve(f, rh, rl)
                xh, xl = dd.dd_add(xh, xl, eh, el)
            return np.asarray(xh + xl, np.float64)

        return jax.pure_callback(
            host_solve, jax.ShapeDtypeStruct((m,), jnp.float64),
            Mh, Ml, Lh, Ll, InvH, InvL, rhs)
