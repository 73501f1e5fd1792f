"""Interior-point core: homogeneous self-dual embedding, NT scaling,
predictor-corrector directions — one fully jitted iteration.

Reference analog: the main IPM loop sedumi.m:428-571 with wregion.m /
sddir.m / sdfactor.m.  The reference solves the Ye-Todd-Mizuno self-dual
embedding in Sturm's v-space; we solve the standard (x,y,z,tau,kappa)
homogeneous self-dual system

    A x - b tau           = 0
    A'y + z - c tau       = 0
    c'x - b'y + kappa     = 0
    x,z in K,  tau,kappa >= 0

with NT-scaled Newton directions and the Mehrotra second-order corrector
(pars.alg=2, the reference default; sedumi.m:121-134).  Per iteration:

  1. residuals + mu
  2. NT scaling from (x,z)                  [nt.compute_scaling]
  3. augmented Schur complement M=[A;c']H[A;c']'  [schur.build_schur]
  4. Cholesky (+ traced regularization, iterative refinement) [chol]
  5. affine ("predictor") direction, boundary step, sigma heuristic
  6. combined ("corrector") direction, step to gamma * boundary
                                            [wregion.m:91-150 analog]

Three Schur solves per iteration (static column u, affine, combined),
matching the reference's solve count (SURVEY.md section 3.2).

Everything is a pure function of the state; the host driver (solver.py)
owns control flow, stopping, and certificate logic, keeping scalars on
host (SURVEY.md section 7 item 6).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import fp
from . import jordan as jd
from . import nt
from . import wregion as wr
from .chol import chol_factor
from .pcg import pcg, refine_solve_dd
from .cones import Layout
from .opA import DenseAOp
from .params import Pars
from .schur import build_schur
from .structs import (
    ConeVec,
    cv_add,
    cv_dot,
    cv_eye,
    cv_neg,
    cv_zeros,
    cv_norm,
    cv_scale,
    cv_sub,
)


class IPMState(NamedTuple):
    x: ConeVec
    y: jax.Array
    z: ConeVec
    tau: jax.Array
    kappa: jax.Array


class DenseSchurEngine:
    """Default linear-system backend: dense augmented Schur complement +
    dense Cholesky + compensated iterative refinement.

    prepare() forms M = [A;c'] H [A;c']' (schur.build_schur — sparsity-aware
    per PSD bucket) and factors the m x m leading block; solve() refines
    against the dense matrix.  The engine interface (prepare/solve) is what
    the large-m sparse engine (sparse_engine.TileSchurEngine) plugs into.

    pars wiring: cg.qprec selects double-double vs plain-f refinement
    residuals (loopPcg.m:100-108 quad accumulation role); schur_dtype
    factors in a lower precision and recovers accuracy by refining against
    the full-precision matrix (TPU mixed-precision Schur path).
    """

    def __init__(self, refine_iters: int = 4, qprec: int = 1,
                 schur_dtype=None, factor_dtype=None, chol_pars=None):
        self.refine_iters = refine_iters
        self.qprec = qprec
        self.schur_dtype = jnp.dtype(schur_dtype) if schur_dtype else None
        # factor_dtype HIGHER than the formation dtype: factor the (compute-
        # dtype-formed) matrix exactly in f64 — on TPU the emulated-f64
        # dense Cholesky of an m<=1000 matrix costs ~60ms, and removing the
        # low-precision FACTORIZATION error (growth-factor amplified) is
        # what keeps the hybrid endgame's preconditioner useful at
        # cond >> 1/eps32; only the formation's entrywise rounding remains.
        self.factor_dtype = jnp.dtype(factor_dtype) if factor_dtype else None
        from .params import CholPars

        self.chol_pars = chol_pars if chol_pars is not None else CholPars()

    def prepare(self, aop, S, reg):
        from .chol import ldl_masked

        m = aop.m
        Maug = build_schur(aop, S)
        ADA = Maug[:m, :m]
        sd = self.schur_dtype
        fd = self.factor_dtype
        if fd is not None and fd != ADA.dtype:
            ADA = ADA.astype(fd)
            f = chol_factor(ADA, jnp.asarray(reg, fd), jacobi=True)
        elif sd is not None and sd != ADA.dtype:
            f = chol_factor(ADA.astype(sd), jnp.asarray(reg, sd))
        else:
            f = chol_factor(ADA, reg)
        # Endgame fallback (the reference's never-fail factorization,
        # blkchol.c:9-20): when the plain Cholesky goes indefinite under
        # the Schur complement's ~1/mu^2 dynamic range, fall back to the
        # masked LDL' with SeDuMi's per-pivot cancellation-add / skip
        # semantics (chol.ldl_masked, driven by pars.chol.*).  lax.cond
        # skips the O(m^3) scalar loop entirely while the Cholesky works.
        cp = self.chol_pars
        zeroL = (jnp.zeros_like(ADA), jnp.zeros(m, ADA.dtype))

        def do_ldl(_):
            fl = ldl_masked(ADA, canceltol=cp.canceltol, maxu=cp.maxu,
                            abstol=cp.abstol, skip_pivots=bool(cp.skip))
            return fl.L, fl.d

        Lldl, dldl = jax.lax.cond(f.ok, lambda _: zeroL, do_ldl, None)
        ok = jnp.logical_or(
            f.ok, jnp.logical_and(jnp.all(jnp.isfinite(Lldl)),
                                  jnp.all(~jnp.isnan(dldl))))
        ctx = (ADA, f, Lldl, dldl)
        return ctx, Maug[:m, m], Maug[m, m], ok

    def solve(self, ctx, rhs):
        from .chol import LdlFactor, chol_solve, ldl_solve, refine_solve

        ADA, f, Lldl, dldl = ctx

        def base_solve(b):
            xc = chol_solve(f, b)
            fl = LdlFactor(L=Lldl, d=dldl,
                           skip=jnp.zeros(dldl.shape, bool),
                           diagadd=jnp.zeros_like(dldl))
            xl = ldl_solve(fl, b)
            return jnp.where(f.ok, xc, xl)

        if ADA.dtype != rhs.dtype:
            # high-precision factor of the compute-dtype-formed matrix:
            # solve exactly in the factor dtype, hand back a compute-dtype
            # direction (the defect-correction loop measures true f64
            # defects, so representation rounding here is benign)
            b64 = rhs.astype(ADA.dtype)
            x = base_solve(b64)
            for _ in range(self.refine_iters):
                x = x + base_solve(b64 - ADA @ x)
            return x.astype(rhs.dtype)
        if f.L.dtype != ADA.dtype:
            # low-precision factor: refine in full precision against ADA,
            # casting only the triangular solves down
            def solve_lo(b):
                return chol_solve(f, b.astype(f.L.dtype)).astype(ADA.dtype)

            x = solve_lo(rhs)
            # an f32 factor loses ~29 bits vs f64: each refinement pass
            # recovers up to ~23 (less when cond(M) eats into them)
            for _ in range(max(6, self.refine_iters)):
                x = x + solve_lo(rhs - ADA @ x)
            return x
        if not self.qprec:
            return refine_solve(lambda v: ADA @ v,
                                base_solve, rhs, iters=self.refine_iters)
        # Krylov endgame recovery (wrapPcg.m:94-130 role, now on the DENSE
        # path too): Richardson refinement (x += P(rhs - ADA x)) DIVERGES
        # once cond(ADA)*eps > 1 (mu ~ 1e-8 in f64; measured as O(1)
        # direction defects and 100x err_p injections in the arch0/control07
        # endgames) — while CG with the same factor as preconditioner still
        # minimizes over the Krylov space and its best-residual fallback
        # can never return something worse than its start.  x0 is two
        # dd-refinement passes (exact in the benign regime); PCG then
        # polishes until stagnation.
        x0 = refine_solve_dd(ADA, base_solve, rhs, iters=2)
        res = pcg(lambda v: ADA @ v, base_solve, rhs, x0,
                  maxiter=12, restol=1e-16)
        return res.x


class StepStats(NamedTuple):
    """Per-iteration scalars returned to the host driver (the structured
    per-iteration log line of sedumi.m:406-407, 519-520)."""

    mu: jax.Array
    alpha: jax.Array
    sigma: jax.Array
    err_p: jax.Array      # ||Ax - b tau|| / tau / (1+||b||inf)
    err_d: jax.Array      # ||A'y + z - c tau|| / tau / (1+||c||inf)
    gap_rel: jax.Array    # |c'x - b'y|/tau / (1+|c'x/tau|+|b'y/tau|)
    cx: jax.Array         # c'x (unscaled by tau)
    by: jax.Array         # b'y
    tau: jax.Array
    kappa: jax.Array
    chol_ok: jax.Array
    res_p_abs: jax.Array  # ||Ax - b tau||
    res_d_abs: jax.Array  # ||A'y + z - c tau||
    dir_defect: jax.Array # ||A dx - b dtau + rp|| / (||rp|| + mu): direction
    #                       quality gate for precision escalation (host)
    wr_delta: jax.Array   # proximity delta of the incoming iterate (iswnbr)
    centered: jax.Array   # 1.0 when the initial centering step was taken
    maxt1: jax.Array      # predictor boundary step from the centered point
    mu_floor: jax.Array   # state-representation complementarity floor:
    #                       eps_dtype * (sum_i |x_i z_i| + tau kappa)/(nu+1)
    #                       — the rounding floor of the COMPUTED gap at this
    #                       iterate.  Below ~this, the gap signal is
    #                       CORRUPTED: pursuing mu further produces
    #                       feasible-but-suboptimal wander (measured on
    #                       control07: a 6.7e-6-suboptimal point graded
    #                       r0=3e-9).  The entrywise |x||z| sum (NOT a
    #                       block-max lammax product: near-complementary
    #                       iterates pair large coordinates with small
    #                       ones, and the max-max model overestimated
    #                       trto3's floor by 4+ orders, cutting its run
    #                       50 iterations early at rel 4.4e-4) makes this
    #                       the honest dot-product-rounding bound.  The
    #                       driver stops the ladder-top phase at this
    #                       floor — only once progress has also stalled.


def cv_jmul(a: ConeVec, b: ConeVec) -> ConeVec:
    return ConeVec(
        l=a.l * b.l,
        q=tuple(jd.q_jmul(x, y) for x, y in zip(a.q, b.q)),
        s=tuple(jd.s_jmul(x, y) for x, y in zip(a.s, b.s)),
    )


def init_state(layout: Layout, aop: DenseAOp, b, normb: float, normc: float,
               pars: Pars, dtype=jnp.float64) -> IPMState:
    """Identity start on the central path (reference: sdinit.m:42-105,
    mu0 = pars.mu * sqrt((1+||b||inf)(1+||c||inf)))."""
    mu0 = pars.mu * float(jnp.sqrt((1.0 + normb) * (1.0 + normc)))
    e = cv_eye(layout, dtype)
    root = float(jnp.sqrt(mu0))
    x = cv_scale(e, root)
    z = cv_scale(e, root)
    y = jnp.zeros((aop.m,), dtype)
    return IPMState(x=x, y=y, z=z, tau=jnp.asarray(1.0, dtype),
                    kappa=jnp.asarray(mu0, dtype))


def cast_state(state: IPMState, dtype) -> IPMState:
    """Cast the iterate between precision phases (fp.precision_mode)."""
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), state)


def make_recenter(layout: Layout, dtype=jnp.float64):
    """Pull a precision-handover iterate strictly back into the cone interior.

    An f32-phase iterate can carry eigenvalues that are zero or slightly
    negative at f64 resolution (f32 rounding at the cone boundary).  The NT
    scaling then clamps sigma^2 to tiny, every maxstep collapses to ~0 and
    the f64 endgame stalls with alpha=0 (observed on arch0).  Shifting by
    rho*e moves every spectral value up by exactly rho (all three families
    share lam(e)=1), restoring lam_min >= 1e-2 * mu / (1 + lam_max(other)) —
    the central-path pairing lam_i(x) lam_i(z) ~ mu.  A no-op (rho=0) for
    iterates already safely interior.  Residuals move by O(rho) only.
    """

    @jax.jit
    def recenter(state: IPMState) -> IPMState:
        x, y, z, tau, kappa = state

        def lam_range(cv: ConeVec):
            mins, maxs = [], []
            if cv.l.size:
                mins.append(jnp.min(cv.l))
                maxs.append(jnp.max(cv.l))
            for xq in cv.q:
                lam = jd.q_eig(xq)
                mins.append(jnp.min(lam))
                maxs.append(jnp.max(lam))
            for xs in cv.s:
                lam = jd.s_eig(xs)
                mins.append(jnp.min(lam))
                maxs.append(jnp.max(lam))
            if not mins:
                zero = jnp.zeros((), dtype)
                return zero, zero
            return jnp.min(jnp.stack(mins)), jnp.max(jnp.stack(maxs))

        gap = cv_dot(x, z)
        mu = (gap + tau * kappa) / (layout.nu + 1.0)
        xmin, xmax = lam_range(x)
        zmin, zmax = lam_range(z)
        floor_x = 1e-2 * mu / (1.0 + zmax)
        floor_z = 1e-2 * mu / (1.0 + xmax)
        rho_x = jnp.maximum(jnp.zeros((), dtype), floor_x - xmin)
        rho_z = jnp.maximum(jnp.zeros((), dtype), floor_z - zmin)
        e = cv_eye(layout, dtype)
        return IPMState(
            x=cv_add(x, cv_scale(e, rho_x)),
            y=y,
            z=cv_add(z, cv_scale(e, rho_z)),
            tau=tau,
            kappa=jnp.maximum(kappa, 1e-2 * mu / (1.0 + tau)),
        )

    return recenter


def make_step(layout: Layout, pars: Pars, normb: float, normc: float,
              cscale: float = 1.0, dtype=None, engine=None,
              compute_dtype=None, err_dens=None):
    """Build the jitted one-iteration step function for a fixed layout.

    The returned function takes (aop, b, rs, state, reg, aop_lo=None) — the
    operator and data are traced arguments, never closed-over constants
    (closing over large arrays triggers XLA constant-folding pathologies at
    compile time).  `aop` carries the state dtype; the optional `aop_lo`
    the compute dtype (defaults to aop when they coincide).

    The solver runs on row-equilibrated A,b and objective-normalized
    c/cscale; `normb`/`normc` are the ORIGINAL-data norms and all reported
    stats (err_p/err_d/gap_rel/cx/by) are in original units, so the
    stopping test matches the reference's DIMACS criteria on user data.

    `engine` is the linear-system backend (prepare/solve contract of
    DenseSchurEngine); None selects the dense engine.

    HYBRID PRECISION (compute_dtype < dtype, the on-device endgame —
    SURVEY.md hard part 1): the STATE, residuals, and direction
    accumulation live in `dtype` (f64 storage; the needed ops are
    elementwise/COO and cheap even under TPU f64 emulation), while the
    expensive kernels — NT scaling eigh, Schur formation, factorization,
    triangular solves — run in `compute_dtype` (f32 on the MXU).  Inexact
    f32 directions are repaired by defect-correction against the exact f64
    residual operator on ALL of the primal, dual and gap rows, so the
    Newton fixed point — and hence the achievable accuracy — is set by the
    f64 residuals, not by the f32 linear algebra (the quad-accumulation
    idea of loopPcg.m/quadadd.c lifted to the whole IPM step).
    """
    nu = layout.nu
    herm_flags = tuple(b.herm for b in layout.s_buckets)
    # convergence-grading denominators (sedumi.m:678-681): the reference
    # normalizes feasibility by 1+maxb+1e-3*maxRb (initial-residual scale)
    # — passed by the driver; the plain 1+norm fallback keeps older callers
    # (graft entry, tests) valid but stricter
    den_p, den_d = err_dens if err_dens is not None else (1.0 + normb,
                                                          1.0 + normc)
    gamma = 0.99  # step fraction to boundary; neighborhood-safe default
    defect_correct = max(0, int(pars.cg.refine))
    dtype = jnp.dtype(fp.resolve_dtype(pars.dtype) if dtype is None else dtype)
    cd = jnp.dtype(compute_dtype) if compute_dtype is not None else dtype
    hybrid = cd != dtype
    if hybrid:
        defect_correct = max(defect_correct, 2)
    if engine is None:
        sdt = None
        if pars.schur_dtype and jnp.dtype(pars.schur_dtype) != cd:
            sdt = pars.schur_dtype
        engine = DenseSchurEngine(qprec=int(pars.cg.qprec), schur_dtype=sdt,
                                  chol_pars=pars.chol)
    if hybrid and hasattr(engine, "factor_dtype") \
            and engine.factor_dtype is None:
        # dense AND panel engines: f64 factor of the f32-formed matrix
        engine.factor_dtype = dtype

    def lo(t):
        return jax.tree_util.tree_map(lambda a: jnp.asarray(a, cd), t)

    def hi(t):
        return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), t)

    eps_cd = float(jnp.finfo(cd).eps)

    def lo_safe(cv: ConeVec) -> ConeVec:
        """Cast an interior f64 iterate to the compute dtype WITHOUT losing
        positivity: an endgame eigenvalue lam_min ~ mu can sit below the
        compute dtype's resolution of lam_max, so the cast alone can make
        the block indefinite (observed: NaN from cholesky(z) at mu~1e-7).
        Shifting each block by ~4 eps_cd * lam_max keeps it PD in cd; the
        shift perturbs only the SCALING (the f64 residual path never sees
        it), i.e. an inexact-Newton direction, which defect-correction
        absorbs."""
        if not hybrid:
            return lo(cv)
        l = lo(cv.l)     # LP: f32 cast of a positive number stays positive
        q = []
        for xq in cv.q:
            x32 = lo(xq)
            q.append(x32.at[..., 0].add(4 * eps_cd * x32[..., 0]))
        s = []
        for xs in cv.s:
            x32 = lo(xs)
            d = x32.shape[-1]
            mx = jnp.max(jnp.abs(jnp.diagonal(x32, axis1=-2, axis2=-1)),
                         axis=-1)
            idx = jnp.arange(d)
            s.append(x32.at[..., idx, idx].add(4 * eps_cd * mx[..., None]))
        return ConeVec(l=l, q=tuple(q), s=tuple(s))

    def _pos_step(val, dval):
        """sup {a : val + a*dval >= 0} for scalar val>0."""
        big = jnp.asarray(jnp.inf, val.dtype)
        return jnp.where(dval < 0, -val / dval, big)

    @functools.partial(jax.jit, donate_argnums=())
    def step(aop, b: jax.Array, rs: jax.Array, state: IPMState,
             reg: jax.Array, aop_lo=None, sd_on=True):
        # rs: row-equilibration scales; convergence is measured on the
        # ORIGINAL row scaling (rp_orig = rp / rs) while all linear algebra
        # runs on the equilibrated system.
        if aop_lo is None:
            aop_lo = aop
        m = aop.m
        x, y, z, tau, kappa = state
        # identity/zero elements built INSIDE the trace: closing over a
        # concrete full-size ConeVec bakes megabytes of literals into the
        # HLO and triggers XLA's pathological constant-folding pass at
        # compile time (observed: >10min TPU compiles on OH-sized layouts)
        e_scaled = cv_eye(layout, cd)
        zero_cv = cv_zeros(layout, cd)

        # --- residuals (state dtype: exact fixed point) --------------------
        ax = aop.apply(x)
        Ax, cx = ax[:m], ax[m]
        rp = Ax - b * tau
        rd = cv_add(aop.adj_y(y, -tau), z)      # A'y + z - c tau
        by = b @ y
        rg = cx - by + kappa
        gap = cv_dot(x, z)
        mu = (gap + tau * kappa) / (nu + 1.0)

        # state-representation complementarity floor (see StepStats doc):
        # the rounding bound of the computed gap, eps * sum_i |x_i z_i|
        # (entrywise over every cone family, PSD included — the gap IS
        # that entrywise dot), normalized like mu itself
        eps_state = float(jnp.finfo(dtype).eps)
        mf_abs = jnp.reshape(jnp.abs(tau * kappa), ())
        if x.l.size:
            mf_abs = mf_abs + jnp.sum(jnp.abs(x.l * z.l))
        for xq_, zq_ in zip(x.q, z.q):
            mf_abs = mf_abs + jnp.sum(jnp.abs(xq_ * zq_))
        for xs_, zs_ in zip(x.s, z.s):
            mf_abs = mf_abs + jnp.sum(jnp.abs(xs_ * zs_))
        mu_floor = eps_state * mf_abs / (nu + 1.0)

        # --- scaling + Schur (compute dtype) -------------------------------
        S = nt.compute_scaling(lo_safe(x), lo_safe(z), herm=herm_flags)
        ctx, ahc, chc, fac_ok = engine.prepare(aop_lo, S, lo(reg))
        tau_l, kappa_l = lo(tau), lo(kappa)
        b_l = lo(b)

        def solve(rhs):
            return engine.solve(ctx, rhs)

        u = solve(b_l + ahc)
        # self-dual denominator: mathematically > 0, but computed as a
        # difference of terms that reach ~1e12 on badly-scaled problems
        # (trto3), so cancellation can leave garbage of either sign; clamp
        # to the cancellation noise floor to keep dtau finite and sane
        bu, au = b_l @ u, ahc @ u
        D_raw = chc + bu - au + kappa_l / tau_l
        D_floor = jnp.finfo(cd).eps * (jnp.abs(chc) + jnp.abs(bu)
                                       + jnp.abs(au)) + jnp.finfo(cd).tiny
        D = jnp.where(jnp.isfinite(D_raw) & (D_raw > D_floor), D_raw, D_floor)

        def direction_raw(rp_rhs, rd_rhs: ConeVec, rg_rhs, rc: ConeVec, r_tk):
            """Newton direction for general right-hand sides (all in the
            compute dtype):
                 A dx - b dtau                  = rp_rhs
                 A'dy + dz - c dtau             = rd_rhs
                 c'dx - b'dy + dkappa           = rg_rhs
                 dx + H dz                      = W(lam^-1 o rc)
                 tau dkappa + kappa dtau        = r_tk
            (sddir.m analog).  Dual and complementarity rows are satisfied
            to compute-dtype accuracy; primal/gap rows to solve accuracy.
            """
            rcx = nt.scale_v_to_x(S, nt.lam_inv_jmul(S, rc))
            hrd = nt.H_apply(S, rd_rhs)
            t = cv_sub(rcx, hrd)
            att = aop_lo.apply(t)
            v = solve(rp_rhs - att[:m])
            num = -rg_rhs + r_tk / tau_l + att[m] - (b_l - ahc) @ v
            dtau = num / D
            dy = v + dtau * u
            g = aop_lo.adj_y(dy, -dtau)         # A'dy - c dtau
            dz = cv_sub(rd_rhs, g)
            dx = cv_sub(rcx, nt.H_apply(S, dz))
            dkappa = (r_tk - kappa_l * dtau) / tau_l
            return dx, dy, dz, dtau, dkappa

        def direction(rc: ConeVec, r_tk, r_scale: float = 1.0):
            """Direction for r_scale times the current residuals, polished
            by defect-correction passes in the STATE dtype: the
            compute-dtype solves re-inject residual on every row;
            re-solving with the exactly-evaluated equation defects as rhs
            drives the direction defect down by the solve accuracy each
            pass (the role of the reference's PCG refine restarts,
            wrapPcg.m:100-130).  In hybrid mode this is what makes f32
            linear algebra deliver f64-quality Newton directions.  Each
            pass is MONOTONE: a correction is kept only if it reduced the
            measured defect (a near-singular compute-dtype factor can
            amplify instead — observed 1e12 defect spikes without this
            guard).  r_scale=0.0 is the pure centering direction
            (wregion.m:47-55: residual rows untouched)."""

            def defects(dx, dy, dz, dtau, dkappa):
                dax = aop.apply(dx)
                def_p = -r_scale * rp - (dax[:m] - b * dtau)
                def_g = -r_scale * rg - (dax[m] - b @ dy + dkappa)
                if hybrid:
                    # dual-row defect (exact-by-construction only in the
                    # compute dtype): A'dy + dz - c dtau + r_scale*rd
                    def_d = cv_neg(
                        cv_add(cv_scale(rd, r_scale),
                               cv_add(aop.adj_y(dy, -dtau), dz)))
                else:
                    def_d = zero_cv
                nrm = (jnp.linalg.norm(def_p) + jnp.abs(def_g)
                       + (cv_norm(def_d) if hybrid else 0.0))
                return def_p, def_d, def_g, nrm

            d0 = direction_raw(lo(-r_scale * rp) if r_scale else
                               jnp.zeros((m,), cd),
                               lo(cv_scale(cv_neg(rd), r_scale)),
                               lo(-r_scale * rg), rc, r_tk)
            dx, dy, dz, dtau, dkappa = hi(d0)
            for _ in range(defect_correct):
                def_p, def_d, def_g, nrm_old = defects(dx, dy, dz, dtau,
                                                       dkappa)
                cx_, cy_, cz_, ct_, ck_ = hi(direction_raw(
                    lo(def_p), lo(def_d), lo(def_g),
                    zero_cv, jnp.zeros((), cd),
                ))
                dx2 = cv_add(dx, cx_)
                dy2 = dy + cy_
                dz2 = cv_add(dz, cz_)
                dtau2 = dtau + ct_
                dkappa2 = dkappa + ck_
                # MONOTONE on every path: refinement against a factor with
                # cond ~ 1/mu^2 stops contracting once cond*eps > 1 (mu
                # ~ 1e-8 in f64) and can AMPLIFY instead — observed on the
                # host64 endgame as sudden 100x err_p injections at healthy
                # alpha (arch0 iter 46: 1.4e-7 -> 1.6e-5 in one step)
                _, _, _, nrm_new = defects(dx2, dy2, dz2, dtau2, dkappa2)
                keep = nrm_new < nrm_old
                pick = lambda a2, a: jax.tree_util.tree_map(
                    lambda u, v: jnp.where(keep, u, v), a2, a)
                dx, dz = pick(dx2, dx), pick(dz2, dz)
                dy = jnp.where(keep, dy2, dy)
                dtau = jnp.where(keep, dtau2, dtau)
                dkappa = jnp.where(keep, dkappa2, dkappa)
            return dx, dy, dz, dtau, dkappa

        lam2 = nt.lam_sq(S)
        lam_cv = nt.lam_as_conevec(S)
        vtk = jnp.sqrt(tau_l * kappa_l)
        # centering contribution (zero unless the Sturm path below fills it)
        zero_hi = cv_zeros(layout, dtype)
        dxc = zero_hi
        dzc = zero_hi
        dyc = jnp.zeros((m,), dtype)
        dtauc = jnp.zeros((), dtype)
        dkappac = jnp.zeros((), dtype)
        xs_b, zs_b = lam_cv, lam_cv          # scaled-space base points
        tau_b_l, kappa_b_l = tau_l, kappa_l

        # the HYBRID phase skips the Sturm centering and the Gondzio
        # rounds: it is a sub-floor endgame polisher entered for a handful
        # of iterations, and the extra solves/eighs tripled its (already
        # 10-minute-scale) XLA compile on OH-sized layouts
        sturm = pars.alg == 2 and pars.wr and not hybrid
        if sturm:
            # ---- Sturm wide-region iteration (wregion.m): INITIAL
            # CENTERING -> predictor -> 2nd-order corrector, all with the
            # one frozen NT scaling / factorization.  The reference spends
            # a centering solve whenever the iterate is off-center
            # (wregion.m:47-73); skipping it leaves the predictor fighting
            # the recentering itself — the alpha ~0.15/0.5 alternation
            # observed on control07 and the 1.5-2.5x iteration inflation
            # of rounds 1-3. ----
            # proximity of the CURRENT iterate: v-space point IS lam, so
            # iswnbr needs no spectral work
            w_parts = [S.lam_l ** 2]
            for ql in S.q_lam:
                w_parts.append(jd.q_eig(ql).reshape(-1) ** 2)
            for sig in S.s_lam:
                w_parts.append((sig ** 2).reshape(-1))
            w_parts.append((vtk ** 2)[None])
            w_all = jnp.concatenate(w_parts)
            delta0, h0, alpha0 = wr.iswnbr(w_all, pars.theta)
            ok0 = (jnp.isfinite(delta0) & jnp.isfinite(h0) & (h0 > 0)
                   & jnp.isfinite(alpha0) & (delta0 > 0))
            fac = jnp.where(ok0, 1.0 - alpha0, 1.0)
            h_eff = jnp.where(ok0, h0, 0.0)
            # spectral projection target vTAR = (1-alpha)*max(h, lam) on
            # the current frames (wregion.m:48)
            lam_q_vals = [jd.q_eig(ql) for ql in S.q_lam]
            vt_l = fac * jnp.maximum(h_eff, S.lam_l)
            vt_q_vals = [fac * jnp.maximum(h_eff, lv) for lv in lam_q_vals]
            vt_s = [fac * jnp.maximum(h_eff, sig) for sig in S.s_lam]
            vt_tk = fac * jnp.maximum(h_eff, vtk)

            def diag_cv(vals_l, q_vecs, vals_s):
                s = []
                for v_ in vals_s:
                    n_, d_ = v_.shape
                    s.append(jnp.zeros((n_, d_, d_), v_.dtype)
                             .at[..., jnp.arange(d_), jnp.arange(d_)]
                             .set(v_))
                return ConeVec(l=vals_l, q=tuple(q_vecs), s=tuple(s))

            # ---- initial centering: Newton toward vTAR, residual rows
            # ZERO (wregion.m:50-55: pv = 2(vTAR - lab), pMode 1); full
            # step, dropped if it leaves the cone interior (the STOP=-1
            # rejection of wregion.m:66-72 — here a no-op fallback) ----
            rc_c = diag_cv(
                2.0 * S.lam_l * (vt_l - S.lam_l),
                [jd.q_remap(ql, 2.0 * lv * (v_ - lv))
                 for ql, lv, v_ in zip(S.q_lam, lam_q_vals, vt_q_vals)],
                [2.0 * sig * (v_ - sig)
                 for sig, v_ in zip(S.s_lam, vt_s)])
            rtk_c = 2.0 * vtk * (vt_tk - vtk)

            def _strict_interior(cv: ConeVec):
                oks = []
                if cv.l.size:
                    oks.append(jnp.all(cv.l > 0))
                for xq in cv.q:
                    oks.append(jnp.all(jd.q_eig(xq)[..., 0] > 0))
                for xs_ in cv.s:
                    ch = jnp.linalg.cholesky(xs_)
                    oks.append(jnp.all(jnp.isfinite(ch)))
                return jnp.all(jnp.stack(oks)) if oks else jnp.asarray(True)

            # the centering solve runs UNDER lax.cond: roughly half the
            # iterations arrive with delta0 = 0 (inside the wide region),
            # where vTAR = lam makes the solve a no-op — skipping it at
            # runtime saves a Schur solve + the positivity probes
            def _do_center(_):
                dc = direction(rc_c, rtk_c, r_scale=0.0)
                dxc_t, dyc_t, dzc_t, dtauc_t, dkappac_t = dc
                dxs_c = nt.scale_x_to_v(S, lo(dxc_t))
                dzs_c = nt.scale_z_to_v(S, lo(dzc_t))
                xs_ct = cv_add(lam_cv, dxs_c)
                zs_ct = cv_add(lam_cv, dzs_c)
                tau_ct = tau_l + lo(dtauc_t)
                kappa_ct = kappa_l + lo(dkappac_t)
                fin_c = jnp.all(jnp.stack(
                    [jnp.all(jnp.isfinite(leaf)) for leaf in
                     jax.tree_util.tree_leaves(dc)]))
                g = (fin_c & (tau_ct > 0) & (kappa_ct > 0)
                     & _strict_interior(xs_ct) & _strict_interior(zs_ct))
                return (dc, xs_ct, zs_ct, tau_ct, kappa_ct, g)

            def _no_center(_):
                dc0 = (zero_hi, jnp.zeros((m,), dtype), zero_hi,
                       jnp.zeros((), dtype), jnp.zeros((), dtype))
                return (dc0, lam_cv, lam_cv, tau_l, kappa_l,
                        jnp.asarray(False))

            (dc, xs_ct, zs_ct, tau_ct, kappa_ct, gate) = jax.lax.cond(
                ok0 & (delta0 > 1e-4), _do_center, _no_center, None)
            dxc_t, dyc_t, dzc_t, dtauc_t, dkappac_t = dc

            def gt(a, b):
                return jax.tree_util.tree_map(
                    lambda u, v: jnp.where(gate, u, v), a, b)

            # gate the centering AND the projection target together: a
            # rejected centering reverts the predictor to plain affine
            dxc, dzc = gt(dxc_t, zero_hi), gt(dzc_t, zero_hi)
            dyc = gt(dyc_t, jnp.zeros((m,), dtype))
            dtauc = gt(dtauc_t, jnp.zeros((), dtype))
            dkappac = gt(dkappac_t, jnp.zeros((), dtype))
            xs_b, zs_b = gt(xs_ct, lam_cv), gt(zs_ct, lam_cv)
            tau_b_l, kappa_b_l = gt(tau_ct, tau_l), gt(kappa_ct, kappa_l)
            vt_l = gt(vt_l, S.lam_l)
            vt_q_vals = [gt(v_, lv) for v_, lv in zip(vt_q_vals, lam_q_vals)]
            vt_s = [gt(v_, sig) for v_, sig in zip(vt_s, S.s_lam)]
            vt_tk = gt(vt_tk, vtk)
            vt_q = [jd.q_remap(ql, v_) for ql, v_ in zip(S.q_lam, vt_q_vals)]
            vtar_cv = diag_cv(vt_l, vt_q, vt_s)

            # ---- predictor from the centered point: pv = -vTAR
            # (wregion.m:73-94), full residual rows ----
            rc_p = diag_cv(
                -S.lam_l * vt_l,
                [jd.q_remap(ql, -(lv * v_))
                 for ql, lv, v_ in zip(S.q_lam, lam_q_vals, vt_q_vals)],
                [-(sig * v_) for sig, v_ in zip(S.s_lam, vt_s)])
            rtk_p = -(vtk * vt_tk)
            dxa, dya, dza, dtaua, dkappaa = direction(rc_p, rtk_p)
            dxs_a = nt.scale_x_to_v(S, lo(dxa))
            dzs_a = nt.scale_z_to_v(S, lo(dza))
            ms_x, ms_z = nt.maxstep_pair(xs_b, dxs_a, zs_b, dzs_a)
            maxt1 = jnp.minimum(
                jnp.minimum(ms_x, ms_z),
                jnp.minimum(_pos_step(tau_b_l, lo(dtaua)),
                            _pos_step(kappa_b_l, lo(dkappaa))))
            maxt1 = jnp.clip(maxt1, 0.0, 1.0)
            # ---- 2nd-order corrector, alg=2 (wregion.m:104-119): target
            # coupling tTAR = 1-(1-maxt1)^3 — implied centering weight
            # sigma = (1-tTAR)*tTAR <= 1/4; the separate centering step is
            # what lets the corrector stay this aggressive ----
            tT = 1.0 - (1.0 - maxt1) ** 3
            sigma = (1.0 - tT) * tT
            gap_c = cv_dot(xs_b, zs_b) + tau_b_l * kappa_b_l
            mu_c = gap_c / (nu + 1.0)
            dxmdz = cv_sub(dxs_a, dzs_a)
            dtk_a = (lo(dtaua) * jnp.sqrt(kappa_l / tau_l)
                     - lo(dkappaa) * jnp.sqrt(tau_l / kappa_l))
            # gd1 = vTAR^{-1} o dxmdz (wregion.m:100-102)
            gd1 = ConeVec(
                l=dxmdz.l / vt_l,
                q=tuple(jd.q_inv_jmul(vq, dq)
                        for vq, dq in zip(vt_q, dxmdz.q)),
                s=tuple(jd.s_inv_jmul_diag(vs, ds)
                        for vs, ds in zip(vt_s, dxmdz.s)))
            t2 = cv_jmul(gd1, dxmdz)
            vtar_inv = diag_cv(
                1.0 / vt_l, [jd.q_inv(vq) for vq in vt_q],
                [1.0 / vs for vs in vt_s])
            pv = cv_add(
                cv_add(cv_scale(t2, tT / 4.0),
                       cv_scale(vtar_inv, (1.0 - tT) * tT * mu_c)),
                cv_scale(vtar_cv, -(1.0 + tT / 4.0)))
            rc = cv_jmul(lam_cv, pv)
            gd1_tk = dtk_a / vt_tk
            pv_tk = ((tT / 4.0) * gd1_tk * dtk_a
                     + (1.0 - tT) * tT * mu_c / vt_tk
                     - (1.0 + tT / 4.0) * vt_tk)
            r_tk = vtk * pv_tk
        else:
            # --- legacy Mehrotra affine (predictor) ----------------------
            dxa, dya, dza, dtaua, dkappaa = direction(
                cv_neg(lam2), jnp.asarray(-tau * kappa, cd))
            dxs_a = nt.scale_x_to_v(S, lo(dxa))
            dzs_a = nt.scale_z_to_v(S, lo(dza))
            amax_a = jnp.minimum(
                jnp.minimum(nt.maxstep_scaled(S, dxs_a),
                            nt.maxstep_scaled(S, dzs_a)),
                jnp.minimum(_pos_step(tau, dtaua),
                            _pos_step(kappa, dkappaa)),
            )
            a_aff = jnp.minimum(1.0, amax_a)
            gap_aff = (
                gap
                + a_aff * (cv_dot(x, dza) + cv_dot(z, dxa))
                + a_aff**2 * cv_dot(dxa, dza)
                + (tau + a_aff * dtaua) * (kappa + a_aff * dkappaa)
            )
            mu_aff = gap_aff / (nu + 1.0)
            sigma = jnp.clip((mu_aff / mu) ** 3, 0.0, 1.0)

            sm_l = jnp.asarray(sigma * mu, cd)  # corrector target

        # --- combined (corrector) ----------------------------------------
        if sturm:
            pass                   # rc, r_tk built above
        elif pars.alg == 0:
            rc = cv_sub(cv_scale(e_scaled, sm_l), lam2)
            r_tk = sm_l - jnp.asarray(tau * kappa, cd)
        elif pars.alg == 1:
            # v-linearized 2nd-order corrector (Sturm-Zhang; wregion.m:105-110
            # case 1): expand v(t) = sqrt(eig(D(x)z)) instead of v(t)^2.
            # Target v + dv = sqrt(sigma mu) e in v-SPACE: with the Newton
            # complementarity row  v o (dxs+dzs) = rc  and the true update
            # lam(1)^2 = v^2 + rc + dxs o dzs, choosing
            #   rc = 2 v o (sqrt(sigma mu) e - v)
            #        + (t1^2/4) (dxs_a - dzs_a) o (dxs_a - dzs_a)
            # lands lam(1)^2 on (v+dv)^2 = sigma mu e - (dv-error)^2: the
            # (dx-dz)^2 term is the affine estimate of dv o dv - dxs o dzs
            # (the reference's gd1 o dxmdz term, wregion.m:107-110).
            t1 = jnp.asarray(jnp.minimum(1.0, amax_a), cd)
            dxmdz = cv_sub(dxs_a, dzs_a)
            lam_cv1 = nt.lam_as_conevec(S)
            root = jnp.sqrt(sm_l)
            rc = cv_add(
                cv_scale(cv_jmul(
                    lam_cv1, cv_sub(cv_scale(e_scaled, root), lam_cv1)), 2.0),
                cv_scale(cv_jmul(dxmdz, dxmdz), 0.25 * t1**2),
            )
            vtk = jnp.sqrt(tau * kappa)
            dtk = (dtaua * jnp.sqrt(kappa / tau)
                   - dkappaa * jnp.sqrt(tau / kappa))
            r_tk = jnp.asarray(
                2.0 * vtk * (jnp.sqrt(sigma * mu) - vtk), cd
            ) + 0.25 * t1**2 * jnp.asarray(dtk, cd)**2
        else:
            corr = cv_jmul(dxs_a, dzs_a)
            rc = cv_sub(cv_sub(cv_scale(e_scaled, sm_l), lam2), corr)
            r_tk = sm_l - jnp.asarray(tau * kappa + dtaua * dkappaa, cd)
        dx, dy, dz, dtau, dkappa = direction(rc, r_tk)
        # direction-quality gate: an exact Newton direction satisfies
        # A dx - b dtau = -rp; the relative defect measures how much the
        # (possibly low-precision) solves corrupted the primal row.  The
        # host escalates precision when this exceeds its tolerance.
        dax_full = aop.apply(dx)
        dir_defect = jnp.linalg.norm(dax_full[:m] - b * dtau + rp) / (
            jnp.linalg.norm(rp) + mu + jnp.asarray(1e-30, dtype)
        )
        # base point of the line search (centered when the Sturm path took
        # the initial centering step; the plain iterate otherwise)
        x_b = cv_add(x, dxc)
        z_b = cv_add(z, dzc)
        tau_b = tau + dtauc
        kappa_b = kappa + dkappac
        gap_b = cv_dot(x_b, z_b)
        dxs = nt.scale_x_to_v(S, lo(dx))
        dzs = nt.scale_z_to_v(S, lo(dz))
        if sturm:
            ms_x, ms_z = nt.maxstep_pair(xs_b, dxs, zs_b, dzs)
            amax_p = jnp.minimum(ms_x, _pos_step(tau_b_l, lo(dtau)))
            amax_d = jnp.minimum(ms_z, _pos_step(kappa_b_l, lo(dkappa)))
        else:
            amax_p = jnp.minimum(nt.maxstep_scaled(S, dxs),
                                 _pos_step(tau, dtau))
            amax_d = jnp.minimum(nt.maxstep_scaled(S, dzs),
                                 _pos_step(kappa, dkappa))
        # --- Gondzio multiple centrality correctors (pars.mcc) -----------
        # New vs the reference (Gondzio '96, lifted to the Jordan frame):
        # the measured mid-phase pathology on control07 is a tightly
        # centered bulk (w/mu quantiles 0.85..1.3) with a SINGLE
        # complementarity pair crashing to ~0.02 mu after each long step —
        # every crash pins the next boundary step at ~0.2 and costs a
        # centering iteration.  Each round re-solves with the outlier
        # projection as the complementarity target (residual rows zero),
        # REUSING the factorization, and is kept only if it lengthens the
        # boundary step.
        def _mcc_round(carry):
            dx, dy, dz, dtau, dkappa, dxs, dzs, amax_p, amax_d = carry
            th = jnp.minimum(
                1.0, 1.5 * gamma * lo(jnp.minimum(amax_p, amax_d)))
            xs_t = jax.tree_util.tree_map(
                lambda a, d_: a + th * d_, xs_b, dxs)
            zs_t = jax.tree_util.tree_map(
                lambda a, d_: a + th * d_, zs_b, dzs)
            w_t = cv_jmul(xs_t, zs_t)
            tau_t = tau_b_l + th * lo(dtau)
            kap_t = kappa_b_l + th * lo(dkappa)
            wtk_t = tau_t * kap_t
            mu_t = (cv_dot(xs_t, zs_t) + wtk_t) / (nu + 1.0)
            blo_, bhi_ = 0.1 * mu_t, 10.0 * mu_t
            rcg_q = []
            for wq in w_t.q:
                ev = jd.q_eig(wq)
                rcg_q.append(jd.q_remap(wq, jnp.clip(ev, blo_, bhi_) - ev))
            rcg_s = []
            from .lax_eigh import coarse_sweeps_for
            from .linalg_ops import eigh_multi as _eigh_multi

            cs_g = (coarse_sweeps_for(max(s_.shape[-1] for s_ in w_t.s),
                                      w_t.s[0].dtype) if w_t.s else None)
            for ww, V in (_eigh_multi(list(w_t.s), sweeps=cs_g)
                          if w_t.s else []):
                dw = jnp.clip(ww, blo_, bhi_) - ww
                rcg_s.append(jnp.einsum(
                    "...ik,...k,...jk->...ij", V, dw, V))
            rc_g = ConeVec(
                l=jnp.clip(w_t.l, blo_, bhi_) - w_t.l,
                q=tuple(rcg_q), s=tuple(rcg_s))
            rtk_g = jnp.clip(wtk_t, blo_, bhi_) - wtk_t
            dxg, dyg, dzg, dtaug, dkappag = direction(
                rc_g, rtk_g, r_scale=0.0)
            dx2 = cv_add(dx, dxg)
            dy2 = dy + dyg
            dz2 = cv_add(dz, dzg)
            dtau2 = dtau + dtaug
            dkappa2 = dkappa + dkappag
            dxs2 = nt.scale_x_to_v(S, lo(dx2))
            dzs2 = nt.scale_z_to_v(S, lo(dz2))
            ms_x2, ms_z2 = nt.maxstep_pair(xs_b, dxs2, zs_b, dzs2)
            amax_p2 = jnp.minimum(ms_x2, _pos_step(tau_b_l, lo(dtau2)))
            amax_d2 = jnp.minimum(ms_z2, _pos_step(kappa_b_l, lo(dkappa2)))
            fin_g = jnp.all(jnp.stack(
                [jnp.all(jnp.isfinite(leaf)) for leaf in
                 jax.tree_util.tree_leaves((dxg, dyg, dzg, dtaug,
                                            dkappag))]))
            better = fin_g & (
                jnp.minimum(amax_p2, amax_d2)
                > 1.05 * lo(jnp.minimum(amax_p, amax_d)))

            def _pk(a2, a):
                return jax.tree_util.tree_map(
                    lambda u, v: jnp.where(better, u, v), a2, a)

            return (_pk(dx2, dx), jnp.where(better, dy2, dy),
                    _pk(dz2, dz), jnp.where(better, dtau2, dtau),
                    jnp.where(better, dkappa2, dkappa),
                    _pk(dxs2, dxs), _pk(dzs2, dzs),
                    jnp.where(better, amax_p2, amax_p),
                    jnp.where(better, amax_d2, amax_d))

        mcc_carry = (dx, dy, dz, dtau, dkappa, dxs, dzs,
                     jnp.asarray(amax_p), jnp.asarray(amax_d))
        for _ in range(max(0, int(pars.mcc)) if not hybrid else 0):
            # runtime gate (lax.cond): the corrector targets SHORT steps —
            # when the boundary step is already >= 0.6 the round is skipped
            # on device, saving its solve + eigh + maxstep on the easy
            # iterations (most of arch0's f32 phase)
            need = lo(jnp.minimum(mcc_carry[7], mcc_carry[8])) < 0.8
            mcc_carry = jax.lax.cond(need, _mcc_round, lambda c: c,
                                     mcc_carry)
        (dx, dy, dz, dtau, dkappa, dxs, dzs, amax_p, amax_d) = mcc_carry
        if pars.mcc and not hybrid:
            dax_full = aop.apply(dx)   # refresh for the stepdif model

        amax_p = jnp.asarray(amax_p, dtype)
        amax_d = jnp.asarray(amax_d, dtype)
        amax = jnp.minimum(amax_p, amax_d)
        alpha = jnp.minimum(gamma * amax, 1.0)
        # alg=0 pins theta=1 (checkpars.m:62-75), where the wide region
        # C(1) degenerates to the central path itself and the neighborhood
        # test would only admit vanishing steps — use plain
        # fraction-to-boundary for that (debugging) mode.
        use_wr = pars.wr and pars.alg != 0
        if use_wr:
            # wide-region acceptance (wregion.m:136-150): largest batched
            # trial step keeping delta(v) <= beta; never larger than the
            # fraction-to-boundary step, searched from the (possibly
            # centered) base point.  Spectra evaluated in the compute
            # dtype (casting the f64 scalars down keeps the batched eigh
            # off the emulated-f64 path).
            # fullt (widelen.m:46-60): the gap-elimination step of the
            # combined direction; trials below fullt/10 get the relaxed
            # delta < 1 acceptance (widelen.m:68)
            gap_tot = gap_b + tau_b * kappa_b
            dgap = (cv_dot(x_b, dz) + cv_dot(z_b, dx)
                    + tau_b * dkappa + kappa_b * dtau)
            qgap = cv_dot(dx, dz) + dtau * dkappa
            qneg = jnp.minimum(qgap, 0.0)
            fullt = jnp.where(
                dgap < -1e-5 * gap_tot,
                2.0 * gap_tot / (-dgap + jnp.sqrt(jnp.maximum(
                    dgap**2 - 4.0 * gap_tot * qneg, 0.0))),
                2.0 * alpha)
            t_wr, _ = wr.widelen_batched(
                xs_b, dxs, dzs, tau_b_l, lo(dtau), kappa_b_l, lo(dkappa),
                lo(alpha), pars.theta, pars.beta, zbase=zs_b,
                fullt=lo(fullt),
            )
            alpha = jnp.minimum(alpha, t_wr)

        tp_eq = td_eq = alpha
        tp = td = alpha
        if pars.stepdif:
            # Primal/dual step-length differentiation — the EXACT 1-D
            # analysis of stepdif.m:39-175, restated for the standard HSD
            # coordinates.  The reference extends ONE of the two steps by a
            # differential t beyond the accepted equal step and compensates
            # the OTHER side MULTIPLICATIVELY (wregion.m:162-168: newz =
            # mu*zscl with mu = 1 + tdif*rdx0) — the homogeneous embedding
            # is scale-invariant per side, so the compensated update keeps
            # the non-extended side's RELATIVE residual exactly invariant.
            # (Round 5's first cut stepped the two sides additively at
            # different rates, which injects (tp-td)*c*dtau into the dual
            # row every differentiated iteration — measured on trto3: the
            # f64 run diverged to numerr=2 once the adaptive trigger
            # enabled differentiation.)  The side to extend follows the
            # reference: the one whose boundary step is larger
            # (wregion.m:164, tp-td sign), never a free merit choice.
            dAx = dax_full[:m] - b * dtau               # d/dtp of rp
            u1 = cv_add(aop.adj_y(dy, jnp.zeros((), dtype)), dz)   # d/dtd of rd
            u2 = aop.adj(jnp.concatenate([jnp.zeros((m,), dtau.dtype),
                                          jnp.reshape(dtau, (1,))]))  # c*dtau
            rr = jnp.vdot(rp, rp)
            ra = jnp.vdot(rp, dAx)
            aa = jnp.vdot(dAx, dAx)
            dd = cv_dot(rd, rd)
            d1m2 = cv_dot(rd, cv_sub(u1, u2))
            e1m2 = cv_dot(cv_sub(u1, u2), cv_sub(u1, u2))
            xz = gap_b
            xdz = cv_dot(x_b, dz)
            zdx = cv_dot(z_b, dx)
            dxdz = cv_dot(dx, dz)
            w1, w2 = pars.w

            tp_hi = jnp.minimum(gamma * amax_p, 1.0)
            td_hi = jnp.minimum(gamma * amax_d, 1.0)
            gap_eq = (xz + alpha * (zdx + xdz) + alpha**2 * dxdz
                      + (tau_b + alpha * dtau) * (kappa_b + alpha * dkappa))
            gap_cap = jnp.maximum(1.25 * gap_eq, 0.0)
            tau_a = tau_b + alpha * dtau
            kap_a = kappa_b + alpha * dkappa
            tk_a = tau_a * kap_a
            # equal-step residual quadratics (compensation keeps the
            # non-extended side's relative residual AT these values)
            rp2_aa = jnp.maximum(rr + 2 * alpha * ra + alpha**2 * aa, 0.0)
            rd2_aa = jnp.maximum(dd + 2 * alpha * d1m2
                                 + alpha**2 * e1m2, 0.0)

            def merit_p(TP):
                # extend the primal pair (x, tau) to TP; (y, z, kappa)
                # step alpha then scale by mu = tau(TP)/tau(alpha):
                # rd_rel invariant, rp contracts at TP, gap rescales by mu
                tau_t = tau_b + TP * dtau
                mu_ = tau_t / tau_a
                rp2 = jnp.maximum(rr + 2 * TP * ra + TP**2 * aa, 0.0)
                bil = xz + TP * zdx + alpha * xdz + TP * alpha * dxdz
                gap_t = mu_ * (bil + tk_a)
                mval = (w1 * jnp.sqrt(rp2) / tau_t
                        + (w2 * jnp.sqrt(rd2_aa) + bil + tk_a) / tau_a)
                ok = (gap_t <= gap_cap) & (tau_t > 0)
                return jnp.where(ok, mval, jnp.inf)

            def merit_d(TD):
                # extend the dual side (y, z, kappa) to TD; (x, tau)
                # step alpha then scale by mu = tau(TD)/tau(alpha) — the
                # rd row's c*tau term then moves WITH the dual rate, so
                # rd contracts at TD and rp_rel stays invariant
                tau_t = tau_b + TD * dtau
                mu_ = tau_t / tau_a
                rd2 = jnp.maximum(dd + 2 * TD * d1m2 + TD**2 * e1m2, 0.0)
                bil = xz + alpha * zdx + TD * xdz + alpha * TD * dxdz
                tk_t = tau_a * (kappa_b + TD * dkappa)
                gap_t = mu_ * (bil + tk_t)
                mval = (w2 * jnp.sqrt(rd2) / tau_t
                        + (w1 * jnp.sqrt(rp2_aa) + bil + tk_t) / tau_a)
                ok = (gap_t <= gap_cap) & (tau_t > 0)
                return jnp.where(ok, mval, jnp.inf)

            def piece_min(fm, t_hi_):
                """Exact 1-D min over [alpha, t_hi_]: dense candidate scan
                + parabolic polish (stepdif.m's breakpoint pieces are
                smooth between gap-cap crossings; the scan brackets them
                and the polish is exact on the winning parabola)."""
                s = jnp.linspace(0.0, 1.0, 33, dtype=dtype)
                tv = alpha + s * (t_hi_ - alpha)
                mv = fm(tv)
                i = jnp.argmin(mv)
                h = (t_hi_ - alpha) / 32.0
                tm_, t0_, tq_ = tv[i] - h, tv[i], tv[i] + h
                fm_, f0, fq_ = fm(tm_), mv[i], fm(tq_)
                denom = fm_ - 2.0 * f0 + fq_
                t_par = t0_ - 0.5 * h * (fq_ - fm_) / jnp.where(
                    jnp.abs(denom) > 1e-300, denom, 1.0)
                t_par = jnp.where(
                    jnp.isfinite(t_par) & (denom > 0),
                    jnp.clip(t_par, alpha, t_hi_), t0_)
                f_par = fm(t_par)
                better = f_par < f0
                return (jnp.where(better, t_par, t0_),
                        jnp.minimum(f_par, f0))

            # side selection (wregion.m:164): extend toward the FARTHER
            # boundary; the base step alpha was capped by the nearer one
            use1 = amax_p >= amax_d
            t1p, f1 = piece_min(merit_p, jnp.maximum(tp_hi, alpha))
            t2d, f2 = piece_min(merit_d, jnp.maximum(td_hi, alpha))
            best_f = jnp.where(use1, f1, f2)
            merit_eq = merit_p(alpha)   # == merit_d(alpha)
            # only differentiate on a CLEAR predicted win (trydif.m's
            # conservatism: the merit coefficients carry cancellation
            # noise on badly scaled problems), and only from a HEALTHY
            # base step — with the base stalled (alpha ~ 0, solves at
            # their conditioning wall) the local model is meaningless
            # and one-sided extensions wander the iterate
            clear_win = (best_f < 0.9 * merit_eq) & (alpha > 0.01)
            tp = jnp.where(clear_win & use1, t1p, alpha)
            td = jnp.where(clear_win & jnp.logical_not(use1), t2d, alpha)
            if use_wr:
                # trydif.m:40-72 — accept the differentiated step only if
                # the candidate iterate stays in the wide region: recompute
                # the product spectra at (tp, td) and run the iswnbr
                # proximity test; reject back to the equal step otherwise.
                # Under lax.cond: the spectral re-test only runs when the
                # grid actually proposed a differentiated pair (clear_win
                # and, in adaptive mode, sd_on) — on optimal runs that is
                # almost never, and the re-test is a full batched
                # cholesky+eigh otherwise wasted every iteration.
                def _do_trydif(_):
                    tp_l, td_l = lo(tp), lo(td)
                    xs_try = jax.tree_util.tree_map(
                        lambda a, d_: a + tp_l * d_, xs_b, dxs)
                    zs_try = jax.tree_util.tree_map(
                        lambda a, d_: a + td_l * d_, zs_b, dzs)
                    wspec = wr.prod_spectrum(xs_try, zs_try)
                    # the compensated update scales the cone spectra AND
                    # tau*kappa by the same mu_c (both extension cases),
                    # and iswnbr's delta is scale-invariant — so the
                    # additive spectra test the compensated candidate
                    # exactly
                    wtk = lo((tau_b + tp * dtau) * (kappa_b + td * dkappa))
                    dl, _, _ = wr.iswnbr(
                        jnp.concatenate([wspec, wtk[None]]), pars.theta)
                    ok_dif = dl <= pars.beta
                    return (jnp.where(ok_dif, tp, alpha),
                            jnp.where(ok_dif, td, alpha))

                differentiated = clear_win if pars.stepdif != 2 \
                    else jnp.logical_and(clear_win, sd_on)
                tp, td = jax.lax.cond(
                    differentiated, _do_trydif,
                    lambda _: (alpha, alpha), None)
            if pars.stepdif == 2:
                # adaptive mode (sedumi.m:434-438): differentiation stays
                # OFF until the host driver turns it on (iter > 20, or
                # feasratio near 1 after iter 5) — the `sd_on` flag is
                # traced, so the switch costs no recompilation
                tp = jnp.where(sd_on, tp, tp_eq)
                td = jnp.where(sd_on, td, td_eq)

        if hybrid:
            # never step along a direction whose measured defect stayed
            # CATASTROPHIC (a beyond-conditioning f32 solve, observed 1e5+):
            # a null step lets the host driver's stall logic escalate
            # instead of regressing the iterate.  Moderately-defective
            # directions (dd ~ O(1)) still make progress and are kept.
            bad_dir = dir_defect > 50.0
            tp = jnp.where(bad_dir, 0.0, tp)
            td = jnp.where(bad_dir, 0.0, td)

        # The step bound amax comes from the (possibly shifted / rounded)
        # spectral model, which can overestimate the true boundary once
        # lam_min approaches the arithmetic's resolution — in hybrid mode
        # through the lo_safe shift, and even in pure f64 at the endgame
        # (observed on trto3: a 0.91-step at mu=1.7e-8 left z indefinite
        # and NaN'd the next iteration's scaling).  Verify the candidate
        # in the STATE dtype and backtrack until strictly interior.
        eps_hi = float(jnp.finfo(dtype).eps)
        # The PSD probe runs in the COMPUTE dtype.  Hybrid phase (cd=f32):
        # an emulated-f64 cholesky inside the backtracking while_loop made
        # OH's hybrid step uncompileable (>9 min), and f32 resolution
        # catches every crossing the f32-model overshoot can produce.
        # Native-f64 phases MUST probe in f64: a legitimate endgame PSD
        # iterate carries lam_min ~ 1e-9 * lam_max, which a f32 cholesky
        # (roundoff ~ d*eps32*lam_max) always grades indefinite — probing
        # those in f32 pinned every accepted step at the 0.6^12 backtrack
        # floor and cost arch0 its 1e-6 parity (round-2 regression).
        probe_dt = jnp.float32 if cd == jnp.float32 else dtype
        eps_pr = float(jnp.finfo(probe_dt).eps)

        def _interior(cv: ConeVec, t_, k_):
            # NUMERICALLY interior: tolerate lam_min down to -4 eps lam_max
            # (representation noise); compute_scaling's eps-relative guards
            # keep the next iteration's factorizations total at that level.
            # Demanding exact positivity here crushed endgame steps to
            # 0.6^12 of their length (observed trto3 crawl at alpha~1e-3).
            oks = [t_ > 0, k_ > 0]
            if cv.l.size:
                oks.append(jnp.all(cv.l > -4 * eps_hi * jnp.max(jnp.abs(cv.l))))
            for xq in cv.q:
                oks.append(jnp.all(
                    jd.q_eig(xq)[..., 0] > -4 * eps_hi * xq[..., 0]))
            for xs in cv.s:
                x32 = jnp.asarray(xs, probe_dt)
                d_ = x32.shape[-1]
                idx = jnp.arange(d_)
                mx = jnp.max(jnp.abs(jnp.diagonal(x32, axis1=-2, axis2=-1)),
                             axis=-1)
                ch = jnp.linalg.cholesky(
                    x32.at[..., idx, idx].add(4 * eps_pr * mx[..., None]))
                oks.append(jnp.all(jnp.isfinite(ch)))
            return jnp.all(jnp.stack(oks))

        def bt_cond(carry):
            tp_, td_, i = carry
            xc = jax.tree_util.tree_map(lambda a, d_: a + tp_ * d_, x_b, dx)
            zc = jax.tree_util.tree_map(lambda a, d_: a + td_ * d_, z_b, dz)
            # tau must stay positive at BOTH rates: it enters the
            # compensated update's mu_c denominator at the base rate
            tau_c = jnp.minimum(tau_b + tp_ * dtau, tau_b + td_ * dtau)
            ok = jnp.logical_and(
                _interior(xc, tau_c, kappa_b + td_ * dkappa),
                _interior(zc, tau_c, kappa_b + td_ * dkappa))
            return jnp.logical_and(jnp.logical_not(ok), i < 12)

        def bt_body(carry):
            tp_, td_, i = carry
            return 0.6 * tp_, 0.6 * td_, i + 1

        tp, td, _ = jax.lax.while_loop(
            bt_cond, bt_body,
            (jnp.asarray(tp, dtype), jnp.asarray(td, dtype),
             jnp.asarray(0)))

        # Differentiated-step state update with homogeneous compensation
        # (wregion.m:162-196): the extended side steps to its own length,
        # the other side steps to the base length and is then SCALED by
        # mu_c = tau(extended)/tau(base) — per-side positive scaling is
        # exact in the self-dual embedding (rp and rd rescale by mu_c, so
        # the relative residuals are invariant), where an additive
        # two-rate update would inject (tp-td)*c*dtau into the dual row.
        # Equal steps give mu_c = 1 and reduce to the plain update.
        ext_p = tp >= td                      # which side was extended
        t_ext = jnp.maximum(tp, td)
        t_base = jnp.minimum(tp, td)
        mu_c = (tau_b + t_ext * dtau) / (tau_b + t_base * dtau)
        sc_z = jnp.where(ext_p, mu_c, 1.0)    # scale on the dual side
        sc_x = jnp.where(ext_p, 1.0, mu_c)    # scale on the primal side
        new = IPMState(
            x=jax.tree_util.tree_map(lambda a, d: sc_x * (a + tp * d),
                                     x_b, dx),
            y=sc_z * (y + dyc + td * dy),
            z=jax.tree_util.tree_map(lambda a, d: sc_z * (a + td * d),
                                     z_b, dz),
            tau=tau_b + t_ext * dtau,
            kappa=sc_z * (kappa_b + td * dkappa),
        )

        alpha = jnp.minimum(tp, td)   # reported step (stall detection)
        res_p = jnp.linalg.norm(rp / rs)
        res_d = cv_norm(rd) * cscale
        cxs = cx / tau * cscale
        bys = by / tau * cscale
        stats = StepStats(
            mu=mu,
            alpha=alpha,
            sigma=sigma,
            err_p=res_p / tau / den_p,
            err_d=res_d / tau / den_d,
            gap_rel=jnp.abs(cxs - bys) / (1.0 + jnp.abs(cxs) + jnp.abs(bys)),
            cx=cx * cscale,
            by=by * cscale,
            tau=tau,
            kappa=kappa,
            chol_ok=fac_ok,
            res_p_abs=res_p,
            res_d_abs=res_d,
            dir_defect=dir_defect,
            wr_delta=(delta0 if sturm else jnp.zeros((), dtype)),
            centered=(gate.astype(dtype) if sturm
                      else jnp.zeros((), dtype)),
            maxt1=(maxt1 if sturm else jnp.zeros((), dtype)),
            mu_floor=mu_floor,
        )
        return new, stats

    return step
