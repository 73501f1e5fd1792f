"""Nesterov-Todd scaling, computed directly from (x, z) each iteration.

Reference analog: updtransfo.m:40-108 maintains the NT scaling d by a
numerically delicate *incremental* triangular update chain
(urotorder -> givensrot -> sqrtinv -> qrK).  On TPU we instead recompute the
scaling from scratch every iteration with batched dense factorizations,
which is numerically direct and maps onto batched cholesky/eigh kernels
(SURVEY.md section 7, hard part 3):

* LP:   d = x/z, scaled point lam = sqrt(x*z).
* SOC:  closed-form NT point w with P(w) z = x:
          gx=sqrt(x'Jx), gz=sqrt(z'Jz), xb=x/gx, zb=z/gz,
          gamma=sqrt((1+xb'zb)/2), wb=(xb+J zb)/(2 gamma) (so wb'J wb=1),
          w = eta*wb with eta^2 = gx/gz,  H = P(w) = eta^2 (2 wb wb' - J).
        u = sqrt(w) gives W = P(u) = H^{1/2} and W^{-1} = P(u^{-1}).
* PSD:  factor Z = Lz Lz', eigh(Lz' X Lz) = Q diag(sig^2) Q', then
          R    = Lz^{-T} Q diag(sig^(1/2))      (H y = R R' y R R')
          Rinv = diag(sig^(-1/2)) Q' Lz'
        satisfy R^{-1} X R^{-T} = R' Z R = diag(sig) =: Lam — both scaled
        variables become the same *diagonal* matrix, so scaled-space Jordan
        ops are elementwise (s_inv_jmul_diag).

The scaled point lam satisfies <lam,lam> = <x,z> per cone.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import jordan as jd
from .linalg_ops import eigh as _eigh
from .structs import ConeVec


class Scaling(NamedTuple):
    """NT scaling for the full cone product (a JAX pytree).

    lam is the scaled point V with <V,V> = x'z; for PSD buckets it is the
    diagonal (vector) of the scaled matrix.
    """

    d_l: jax.Array                      # [nl] = x/z
    lam_l: jax.Array                    # [nl] = sqrt(x z)
    q_wb: tuple[jax.Array, ...]         # [n,d] normalized NT point
    q_eta2: tuple[jax.Array, ...]       # [n]   = gx/gz
    q_u: tuple[jax.Array, ...]          # [n,d] = sqrt(w)
    q_uinv: tuple[jax.Array, ...]       # [n,d] = w^{-1/2}
    q_lam: tuple[jax.Array, ...]        # [n,d] scaled point (full vector)
    s_r: tuple[jax.Array, ...]          # [n,d,d]
    s_rinv: tuple[jax.Array, ...]       # [n,d,d]
    s_lam: tuple[jax.Array, ...]        # [n,d] diagonal scaled point


def compute_scaling(x: ConeVec, z: ConeVec,
                    herm: tuple[bool, ...] | None = None) -> Scaling:
    """NT scaling, total on NUMERICALLY interior points: an endgame iterate
    can carry spectral values at the roundoff floor of its large ones
    (lam_min ~ eps * lam_max), where a raw Cholesky/sqrt NaNs.  Every
    factorization below is guarded by an eps-relative clamp/shift — a
    perturbation at the representation's own noise level, so the scaling
    is exact for any iterate that is interior by more than roundoff."""
    eps = jnp.finfo(x.l.dtype if x.l.size else
                    (x.s[0].dtype if x.s else x.q[0].dtype)).eps

    def _posl(v):
        if not v.size:
            return v
        return jnp.maximum(v, 4 * eps * jnp.max(jnp.abs(v)))

    # --- LP ---
    xl, zl = _posl(x.l), _posl(z.l)
    d_l = xl / zl
    lam_l = jnp.sqrt(xl * zl)

    # --- SOC ---
    q_wb, q_eta2, q_u, q_uinv, q_lam = [], [], [], [], []
    for xq, zq in zip(x.q, z.q):
        floor_x = (4 * eps) ** 2 * xq[..., 0] ** 2
        floor_z = (4 * eps) ** 2 * zq[..., 0] ** 2
        gx = jnp.sqrt(jnp.maximum(jd.q_tdet(xq), floor_x))
        gz = jnp.sqrt(jnp.maximum(jd.q_tdet(zq), floor_z))
        xb = xq / gx[..., None]
        zb = zq / gz[..., None]
        xbzb = jnp.sum(xb * zb, axis=-1)
        gamma = jnp.sqrt(0.5 * (1.0 + xbzb))
        jzb = jnp.concatenate([zb[..., :1], -zb[..., 1:]], axis=-1)
        wb = (xb + jzb) / (2.0 * gamma[..., None])
        eta2 = gx / gz
        w = jnp.sqrt(eta2)[..., None] * wb
        u = jd.q_sqrt(w)
        uinv = jd.q_inv(u)
        lam = jd.q_quad_rep_apply(u, zq)
        q_wb.append(wb)
        q_eta2.append(eta2)
        q_u.append(u)
        q_uinv.append(uinv)
        q_lam.append(lam)

    # --- PSD ---
    # bucket eighs run as ONE padded batched Jacobi call (eigh_multi): the
    # kernel is latency-bound in its sequential rotation loop, so b buckets
    # cost max(rounds), not sum(rounds).  Buckets flagged `herm` hold
    # rho-EMBEDDED complex-Hermitian blocks [[Re,-Im],[Im,Re]] (order 2d):
    # the whole factorization chain runs natively complex at order d —
    # half the sequential rotation rounds and 1/2 the congruence flops of
    # the embedding (reference complex paths: psdeig.m:64-67,
    # spscale.c:249-332) — then re-embeds R, Rinv, and the (doubled)
    # spectrum, since rho is a *-homomorphism: rho(A)rho(B)=rho(AB).
    from .linalg_ops import _use_jacobi, eigh_herm_multi, eigh_multi

    # Native-complex factorization only where the COMPLEX arithmetic is
    # safe for the tracing target: the LAPACK path (CPU backend or the
    # host64 phase's impl_override("xla")) handles complex natively; the
    # TPU's x64-rewriter pass CRASHES on complex128 inside the Jacobi
    # while_loop (measured: 'Check failed: abs(f64 gather)' SIGABRT in
    # the compile helper), so device-traced steps keep the r3-proven
    # real-embedded path.  The complex kernel remains the CPU-endgame win
    # (most hard-example iterations run there) and is ready for device
    # complex support.
    herm_ok = not _use_jacobi()
    herm_t = tuple(herm) if (herm is not None and herm_ok) \
        else (False,) * len(x.s)

    def _to_c(e):
        d = e.shape[-1] // 2
        re = 0.5 * (e[..., :d, :d] + e[..., d:, d:])
        im = 0.5 * (e[..., d:, :d] - e[..., :d, d:])
        h = re + 1j * im
        return 0.5 * (h + jnp.conj(jnp.swapaxes(h, -1, -2)))

    def _rho_j(Mc):
        re, im = jnp.real(Mc), jnp.imag(Mc)
        top = jnp.concatenate([re, -im], axis=-1)
        bot = jnp.concatenate([im, re], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    s_r, s_rinv, s_lam = [None] * len(x.s), [None] * len(x.s), \
        [None] * len(x.s)
    lz_list, m_list, ids_r = [], [], []
    lzc_list, mc_list, ids_h = [], [], []
    for bi, (xs, zs) in enumerate(zip(x.s, z.s)):
        if herm_t[bi]:
            xc, zc = _to_c(xs), _to_c(zs)
            d = zc.shape[-1]
            idx = jnp.arange(d)
            mxz = jnp.max(jnp.abs(jnp.real(
                jnp.diagonal(zc, axis1=-2, axis2=-1))), axis=-1)
            zc_g = zc.at[..., idx, idx].add(4 * eps * mxz[..., None])
            lzc = jnp.linalg.cholesky(zc_g)
            mc = jnp.einsum("...ba,...bc,...cd->...ad",
                            jnp.conj(lzc), xc, lzc)
            lzc_list.append(lzc)
            mc_list.append(mc)
            ids_h.append(bi)
            continue
        d = zs.shape[-1]
        idx = jnp.arange(d)
        mxz = jnp.max(jnp.abs(jnp.diagonal(zs, axis1=-2, axis2=-1)), axis=-1)
        zs_g = zs.at[..., idx, idx].add(4 * eps * mxz[..., None])
        lz = jnp.linalg.cholesky(zs_g)
        m = jnp.einsum("...ba,...bc,...cd->...ad", lz, xs, lz)
        lz_list.append(lz)
        m_list.append(m)
        ids_r.append(bi)
    eigs = eigh_multi(m_list) if m_list else []
    for bi, lz, (sig2, qmat) in zip(ids_r, lz_list, eigs):
        sig2 = jnp.maximum(
            sig2,
            (4 * eps) ** 2 * jnp.max(sig2, axis=-1, keepdims=True)
            + jnp.finfo(sig2.dtype).tiny,
        )
        sig = jnp.sqrt(sig2)
        shalf = jnp.sqrt(sig)
        # R = Lz^{-T} Q diag(sig^{1/2}): triangular solve with Lz' (upper).
        qs = qmat * shalf[..., None, :]
        r = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(lz, -1, -2), qs, lower=False
        )
        rinv = (jnp.swapaxes(qmat, -1, -2) / shalf[..., :, None]) @ jnp.swapaxes(lz, -1, -2)
        s_r[bi] = r
        s_rinv[bi] = rinv
        s_lam[bi] = sig
    eigs_h = eigh_herm_multi(mc_list) if mc_list else []
    for bi, lzc, (sig2, qc) in zip(ids_h, lzc_list, eigs_h):
        sig2 = jnp.maximum(
            sig2,
            (4 * eps) ** 2 * jnp.max(sig2, axis=-1, keepdims=True)
            + jnp.finfo(sig2.dtype).tiny,
        )
        sig = jnp.sqrt(sig2)
        shalf = jnp.sqrt(sig)
        qs = qc * shalf[..., None, :].astype(qc.dtype)
        rc = jax.scipy.linalg.solve_triangular(
            jnp.conj(jnp.swapaxes(lzc, -1, -2)), qs, lower=False)
        rinvc = (jnp.conj(jnp.swapaxes(qc, -1, -2))
                 / shalf[..., :, None].astype(qc.dtype)) \
            @ jnp.conj(jnp.swapaxes(lzc, -1, -2))
        s_r[bi] = _rho_j(rc)
        s_rinv[bi] = _rho_j(rinvc)
        s_lam[bi] = jnp.concatenate([sig, sig], axis=-1)

    return Scaling(
        d_l=d_l, lam_l=lam_l,
        q_wb=tuple(q_wb), q_eta2=tuple(q_eta2), q_u=tuple(q_u),
        q_uinv=tuple(q_uinv), q_lam=tuple(q_lam),
        s_r=tuple(s_r), s_rinv=tuple(s_rinv), s_lam=tuple(s_lam),
    )


# --- scaled-space transport -------------------------------------------------


def scale_x_to_v(S: Scaling, dx: ConeVec) -> ConeVec:
    """W^{-1} dx: x-space -> scaled space (PSD: R^{-1} dX R^{-T})."""
    l = dx.l / jnp.sqrt(S.d_l)
    q = tuple(jd.q_quad_rep_apply(ui, d) for ui, d in zip(S.q_uinv, dx.q))
    s = tuple(jd.s_congr_t(ri, d) for ri, d in zip(S.s_rinv, dx.s))
    return ConeVec(l=l, q=q, s=s)


def scale_z_to_v(S: Scaling, dz: ConeVec) -> ConeVec:
    """W dz: z-space -> scaled space (PSD: R' dZ R)."""
    l = dz.l * jnp.sqrt(S.d_l)
    q = tuple(jd.q_quad_rep_apply(u, d) for u, d in zip(S.q_u, dz.q))
    s = tuple(jd.s_congr(r, d) for r, d in zip(S.s_r, dz.s))
    return ConeVec(l=l, q=q, s=s)


def scale_v_to_x(S: Scaling, v: ConeVec) -> ConeVec:
    """W v: scaled space -> x-space (PSD: R V R')."""
    l = v.l * jnp.sqrt(S.d_l)
    q = tuple(jd.q_quad_rep_apply(u, d) for u, d in zip(S.q_u, v.q))
    s = tuple(jd.s_congr_t(r, d) for r, d in zip(S.s_r, v.s))
    return ConeVec(l=l, q=q, s=s)


def scale_v_to_z(S: Scaling, v: ConeVec) -> ConeVec:
    """W^{-1} v: scaled space -> z-space (PSD: R^{-T} V R^{-1})."""
    l = v.l / jnp.sqrt(S.d_l)
    q = tuple(jd.q_quad_rep_apply(ui, d) for ui, d in zip(S.q_uinv, v.q))
    s = tuple(jd.s_congr(ri, d) for ri, d in zip(S.s_rinv, v.s))
    return ConeVec(l=l, q=q, s=s)


def H_apply(S: Scaling, u: ConeVec) -> ConeVec:
    """H u = W^2 u = P(d) u (reference PopK.m / psdscale two-sided)."""
    l = S.d_l * u.l
    q = []
    for wb, eta2, uq in zip(S.q_wb, S.q_eta2, u.q):
        wu = jnp.sum(wb * uq, axis=-1)
        ju = jnp.concatenate([uq[..., :1], -uq[..., 1:]], axis=-1)
        q.append(eta2[..., None] * (2.0 * wb * wu[..., None] - ju))
    s = tuple(
        jd.s_congr_t(r, jd.s_congr(r, us))  # R (R' U R) R'
        for r, us in zip(S.s_r, u.s)
    )
    return ConeVec(l=l, q=tuple(q), s=s)


def lam_sq(S: Scaling) -> ConeVec:
    """lam o lam in scaled space (as a ConeVec)."""
    l = S.lam_l ** 2
    q = tuple(jd.q_jmul(lam, lam) for lam in S.q_lam)
    s = []
    for sig in S.s_lam:
        n, d = sig.shape
        s.append(jnp.zeros((n, d, d), sig.dtype).at[..., jnp.arange(d), jnp.arange(d)].set(sig**2))
    return ConeVec(l=l, q=q, s=tuple(s))


def lam_inv_jmul(S: Scaling, r: ConeVec) -> ConeVec:
    """Solve lam o u = r in scaled space."""
    l = r.l / S.lam_l
    q = tuple(jd.q_inv_jmul(lam, rq) for lam, rq in zip(S.q_lam, r.q))
    s = tuple(jd.s_inv_jmul_diag(sig, rs) for sig, rs in zip(S.s_lam, r.s))
    return ConeVec(l=l, q=q, s=tuple(s))


def lam_as_conevec(S: Scaling) -> ConeVec:
    """The scaled point lam as a ConeVec (PSD: diagonal matrices)."""
    s = []
    for sig in S.s_lam:
        n, d = sig.shape
        s.append(jnp.zeros((n, d, d), sig.dtype).at[..., jnp.arange(d), jnp.arange(d)].set(sig))
    return ConeVec(l=S.lam_l, q=S.q_lam, s=tuple(s))


def _maxstep_psd_probes(base: ConeVec, dv: ConeVec):
    """Per-bucket probe matrices Lc^{-1} dv Lc^{-T} for the generalized
    maxstep (maxstep.m:62-66 role): min-eig of each bounds the step."""
    m_list = []
    for bs, ds in zip(base.s, dv.s):
        dt = bs.dtype
        eps = jnp.finfo(dt).eps
        d = bs.shape[-1]
        idx = jnp.arange(d)
        mx = jnp.max(jnp.abs(jnp.diagonal(bs, axis1=-2, axis2=-1)), axis=-1)
        lc = jnp.linalg.cholesky(bs.at[..., idx, idx].add(
            4 * eps * mx[..., None]))
        t1 = jax.scipy.linalg.solve_triangular(lc, ds, lower=True)
        m = jax.scipy.linalg.solve_triangular(
            lc, jnp.swapaxes(t1, -1, -2), lower=True)
        m_list.append(0.5 * (m + jnp.swapaxes(m, -1, -2)))
    return m_list


def _coarse(cv: ConeVec) -> int | None:
    """Coarse Jacobi budget for line-search spectra (lax_eigh note)."""
    from .lax_eigh import coarse_sweeps_for

    dims = [s.shape[-1] for s in cv.s]
    if not dims:
        return None
    dt = cv.s[0].dtype
    return coarse_sweeps_for(max(dims), dt)


def _psd_steps(m_list, dt, sweeps=None):
    from .linalg_ops import eigvalsh_multi

    big = jnp.asarray(jnp.inf, dt)
    out = []
    for lmin_all in (eigvalsh_multi(m_list, sweeps=sweeps)
                     if m_list else []):
        lmin = jnp.min(lmin_all, axis=-1)
        st = jnp.where(lmin < 0,
                       -1.0 / jnp.minimum(lmin, -jnp.finfo(dt).tiny), big)
        out.append(jnp.min(st, initial=big))
    return out


def _cv_dtype(cv: ConeVec):
    return cv.l.dtype if cv.l.size else (
        cv.s[0].dtype if cv.s else cv.q[0].dtype)


def maxstep_from(base: ConeVec, dv: ConeVec) -> jax.Array:
    """sup {a : base + a*dv in K} for a GENERAL interior scaled-space point.

    The centered iterate xc = v + dxc of the initial centering step
    (wregion.m:56-58) is not diagonal in the PSD buckets, so the reference
    computes maxstep via psdfactor(xc) + psdinvscale + minpsdeig
    (maxstep.m:62-66).  Same here, batched: per bucket one (eps-guarded)
    Cholesky base = Lc Lc', then min-eig of Lc^{-1} dv Lc^{-T} at the
    coarse line-search sweep budget (the interior backtracking probe in
    ipm.make_step guards against over-estimates).
    """
    dt = _cv_dtype(base)
    big = jnp.asarray(jnp.inf, dt)
    steps = [jd.l_maxstep(base.l, dv.l)]
    for bq, dq in zip(base.q, dv.q):
        steps.append(jnp.min(jd.q_maxstep(bq, dq), initial=big))
    steps += _psd_steps(_maxstep_psd_probes(base, dv), dt,
                        sweeps=_coarse(base))
    return jnp.min(jnp.stack(steps)) if steps else big


def maxstep_pair(bx: ConeVec, dvx: ConeVec, bz: ConeVec, dvz: ConeVec):
    """(maxstep_from(bx, dvx), maxstep_from(bz, dvz)) with BOTH sides'
    PSD probes batched into ONE Jacobi call — the eigensolver's cost on
    TPU is its sequential rotation rounds, so the batch is nearly free
    while two separate calls serialize (measured: batch 20 costs ~1.2x
    batch 2 at n=176)."""
    dt = _cv_dtype(bx)
    big = jnp.asarray(jnp.inf, dt)
    steps_x = [jd.l_maxstep(bx.l, dvx.l)]
    for bq, dq in zip(bx.q, dvx.q):
        steps_x.append(jnp.min(jd.q_maxstep(bq, dq), initial=big))
    steps_z = [jd.l_maxstep(bz.l, dvz.l)]
    for bq, dq in zip(bz.q, dvz.q):
        steps_z.append(jnp.min(jd.q_maxstep(bq, dq), initial=big))
    mx = _maxstep_psd_probes(bx, dvx)
    mz = _maxstep_psd_probes(bz, dvz)
    both = _psd_steps(mx + mz, dt, sweeps=_coarse(bx))
    steps_x += both[:len(mx)]
    steps_z += both[len(mx):]
    return (jnp.min(jnp.stack(steps_x)) if steps_x else big,
            jnp.min(jnp.stack(steps_z)) if steps_z else big)


def maxstep_scaled(S: Scaling, dv: ConeVec) -> jax.Array:
    """sup {a : lam + a*dv in K} over the whole product, in scaled space.

    Equals the unscaled max step (W preserves the cone).  Reference analog:
    maxstep.m (LP ratio test, Lorentz eigen-quadratic, PSD min-eigenvalue).
    """
    big = jnp.asarray(jnp.inf, S.d_l.dtype if S.d_l.size else jnp.float64)
    steps = [jd.l_maxstep(S.lam_l, dv.l)]
    for lam, dq in zip(S.q_lam, dv.q):
        st = jd.q_maxstep(lam, dq)
        steps.append(jnp.min(st, initial=big))
    # PSD buckets: one padded batched eigvalsh (see compute_scaling note)
    from .linalg_ops import eigvalsh_multi

    m_list = []
    for sig, ds in zip(S.s_lam, dv.s):
        isq = 1.0 / jnp.sqrt(sig)
        m_list.append(ds * isq[..., :, None] * isq[..., None, :])
    from .lax_eigh import coarse_sweeps_for

    cs = (coarse_sweeps_for(max(m.shape[-1] for m in m_list),
                            m_list[0].dtype) if m_list else None)
    for sig, lmin_all in zip(S.s_lam,
                             eigvalsh_multi(m_list, sweeps=cs)
                             if m_list else []):
        lmin = jnp.min(lmin_all, axis=-1)
        st = jnp.where(
            lmin < 0,
            -1.0 / jnp.minimum(lmin, -jnp.finfo(sig.dtype).tiny), big)
        steps.append(jnp.min(st, initial=big))
    return jnp.min(jnp.stack(steps)) if steps else big
