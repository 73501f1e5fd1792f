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
from .pcg import refine_solve_dd
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

    def __init__(self, refine_iters: int = 2, qprec: int = 1,
                 schur_dtype=None):
        self.refine_iters = refine_iters
        self.qprec = qprec
        self.schur_dtype = jnp.dtype(schur_dtype) if schur_dtype else None

    def prepare(self, aop, S, reg):
        m = aop.m
        Maug = build_schur(aop, S)
        ADA = Maug[:m, :m]
        sd = self.schur_dtype
        if sd is not None and sd != ADA.dtype:
            f = chol_factor(ADA.astype(sd), jnp.asarray(reg, sd))
        else:
            f = chol_factor(ADA, reg)
        ctx = (ADA, f)
        return ctx, Maug[:m, m], Maug[m, m], f.ok

    def solve(self, ctx, rhs):
        ADA, f = ctx
        if f.L.dtype != ADA.dtype:
            # low-precision factor: refine in full precision against ADA,
            # casting only the triangular solves down
            from .chol import CholFactor, chol_solve, refine_solve

            def solve_lo(b):
                return chol_solve(f, b.astype(f.L.dtype)).astype(ADA.dtype)

            x = solve_lo(rhs)
            # an f32 factor loses ~29 bits vs f64: each refinement pass
            # recovers ~23, so 4 passes reach the f64 floor
            for _ in range(max(4, self.refine_iters)):
                x = x + solve_lo(rhs - ADA @ x)
            return x
        if not self.qprec:
            from .chol import refine_solve

            return refine_solve(lambda v: ADA @ v, f, rhs,
                                iters=self.refine_iters)
        return refine_solve_dd(ADA, f, rhs, iters=self.refine_iters)


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
              cscale: float = 1.0, dtype=None, engine=None):
    """Build the jitted one-iteration step function for a fixed layout.

    The returned function takes (aop, b, rs, state, reg) — the operator and
    data are traced arguments, never closed-over constants (closing over
    large arrays triggers XLA constant-folding pathologies at compile time).

    The solver runs on row-equilibrated A,b and objective-normalized
    c/cscale; `normb`/`normc` are the ORIGINAL-data norms and all reported
    stats (err_p/err_d/gap_rel/cx/by) are in original units, so the
    stopping test matches the reference's DIMACS criteria on user data.

    `engine` is the linear-system backend (prepare/solve contract of
    DenseSchurEngine); None selects the dense engine.
    """
    nu = layout.nu
    gamma = 0.99  # step fraction to boundary; neighborhood-safe default
    defect_correct = max(0, int(pars.cg.refine))
    dtype = jnp.dtype(fp.resolve_dtype(pars.dtype) if dtype is None else dtype)
    if engine is None:
        sdt = None
        if pars.schur_dtype and jnp.dtype(pars.schur_dtype) != dtype:
            sdt = pars.schur_dtype
        engine = DenseSchurEngine(qprec=int(pars.cg.qprec), schur_dtype=sdt)

    def _pos_step(val, dval):
        """sup {a : val + a*dval >= 0} for scalar val>0."""
        big = jnp.asarray(jnp.inf, val.dtype)
        return jnp.where(dval < 0, -val / dval, big)

    @functools.partial(jax.jit, donate_argnums=())
    def step(aop: DenseAOp, b: jax.Array, rs: jax.Array, state: IPMState,
             reg: jax.Array):
        # rs: row-equilibration scales; convergence is measured on the
        # ORIGINAL row scaling (rp_orig = rp / rs) while all linear algebra
        # runs on the equilibrated system.
        m = aop.m
        x, y, z, tau, kappa = state
        # identity/zero elements built INSIDE the trace: closing over a
        # concrete full-size ConeVec bakes megabytes of literals into the
        # HLO and triggers XLA's pathological constant-folding pass at
        # compile time (observed: >10min TPU compiles on OH-sized layouts)
        e_scaled = cv_eye(layout, dtype)
        zero_cv = cv_zeros(layout, dtype)

        # --- residuals ---------------------------------------------------
        ax = aop.apply(x)
        Ax, cx = ax[:m], ax[m]
        rp = Ax - b * tau
        rd = cv_add(aop.adj_y(y, -tau), z)      # A'y + z - c tau
        by = b @ y
        rg = cx - by + kappa
        gap = cv_dot(x, z)
        mu = (gap + tau * kappa) / (nu + 1.0)

        # --- scaling + Schur ---------------------------------------------
        S = nt.compute_scaling(x, z)
        ctx, ahc, chc, fac_ok = engine.prepare(aop, S, reg)

        def solve(rhs):
            return engine.solve(ctx, rhs)

        u = solve(b + ahc)
        D = chc + b @ u - ahc @ u + kappa / tau

        def direction_raw(rp_rhs, rd_rhs: ConeVec, rg_rhs, rc: ConeVec, r_tk):
            """Newton direction for general right-hand sides:
                 A dx - b dtau                  = rp_rhs
                 A'dy + dz - c dtau             = rd_rhs
                 c'dx - b'dy + dkappa           = rg_rhs
                 dx + H dz                      = W(lam^-1 o rc)
                 tau dkappa + kappa dtau        = r_tk
            (sddir.m analog).  Dual and complementarity rows are satisfied
            exactly by construction; primal/gap rows up to solve accuracy.
            """
            rcx = nt.scale_v_to_x(S, nt.lam_inv_jmul(S, rc))
            hrd = nt.H_apply(S, rd_rhs)
            t = cv_sub(rcx, hrd)
            att = aop.apply(t)
            v = solve(rp_rhs - att[:m])
            num = -rg_rhs + r_tk / tau + att[m] - (b - ahc) @ v
            dtau = num / D
            dy = v + dtau * u
            g = aop.adj_y(dy, -dtau)            # A'dy - c dtau
            dz = cv_sub(rd_rhs, g)
            dx = cv_sub(rcx, nt.H_apply(S, dz))
            dkappa = (r_tk - kappa * dtau) / tau
            return dx, dy, dz, dtau, dkappa

        def direction(rc: ConeVec, r_tk):
            """Direction for the full current residuals, polished by
            defect-correction passes: the Schur solve's relative error
            re-injects primal residual (the stall floor of plain Mehrotra);
            re-solving with the primal/gap equation defects as rhs drives
            the direction defect to O(solve_err^2) (the role of the
            reference's PCG refine restarts, wrapPcg.m:100-130)."""
            dx, dy, dz, dtau, dkappa = direction_raw(-rp, cv_neg(rd), -rg, rc, r_tk)
            for _ in range(defect_correct):
                dax = aop.apply(dx)
                def_p = -rp - (dax[:m] - b * dtau)
                def_g = -rg - (dax[m] - b @ dy + dkappa)
                cx_, cy_, cz_, ct_, ck_ = direction_raw(
                    def_p, zero_cv, def_g,
                    zero_cv, jnp.zeros((), dtype),
                )
                dx = cv_add(dx, cx_)
                dy = dy + cy_
                dz = cv_add(dz, cz_)
                dtau = dtau + ct_
                dkappa = dkappa + ck_
            return dx, dy, dz, dtau, dkappa

        lam2 = nt.lam_sq(S)

        # --- affine (predictor) ------------------------------------------
        dxa, dya, dza, dtaua, dkappaa = direction(cv_neg(lam2), -tau * kappa)
        dxs_a = nt.scale_x_to_v(S, dxa)
        dzs_a = nt.scale_z_to_v(S, dza)
        amax_a = jnp.minimum(
            jnp.minimum(nt.maxstep_scaled(S, dxs_a), nt.maxstep_scaled(S, dzs_a)),
            jnp.minimum(_pos_step(tau, dtaua), _pos_step(kappa, dkappaa)),
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

        # --- combined (corrector) ----------------------------------------
        if pars.alg == 0:
            rc = cv_sub(cv_scale(e_scaled, sigma * mu), lam2)
            r_tk = sigma * mu - tau * kappa
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
            t1 = jnp.minimum(1.0, amax_a)
            dxmdz = cv_sub(dxs_a, dzs_a)
            lam_cv1 = nt.lam_as_conevec(S)
            root = jnp.sqrt(sigma * mu)
            rc = cv_add(
                cv_scale(cv_jmul(
                    lam_cv1, cv_sub(cv_scale(e_scaled, root), lam_cv1)), 2.0),
                cv_scale(cv_jmul(dxmdz, dxmdz), 0.25 * t1**2),
            )
            vtk = jnp.sqrt(tau * kappa)
            dtk = (dtaua * jnp.sqrt(kappa / tau)
                   - dkappaa * jnp.sqrt(tau / kappa))
            r_tk = 2.0 * vtk * (root - vtk) + 0.25 * t1**2 * dtk**2
        else:
            corr = cv_jmul(dxs_a, dzs_a)
            rc = cv_sub(cv_sub(cv_scale(e_scaled, sigma * mu), lam2), corr)
            r_tk = sigma * mu - tau * kappa - dtaua * dkappaa
        dx, dy, dz, dtau, dkappa = direction(rc, r_tk)
        # direction-quality gate: an exact Newton direction satisfies
        # A dx - b dtau = -rp; the relative defect measures how much the
        # (possibly low-precision) solves corrupted the primal row.  The
        # host escalates precision when this exceeds its tolerance.
        dax_full = aop.apply(dx)
        dir_defect = jnp.linalg.norm(dax_full[:m] - b * dtau + rp) / (
            jnp.linalg.norm(rp) + mu + jnp.asarray(1e-30, dtype)
        )
        dxs = nt.scale_x_to_v(S, dx)
        dzs = nt.scale_z_to_v(S, dz)
        amax_p = jnp.minimum(nt.maxstep_scaled(S, dxs), _pos_step(tau, dtau))
        amax_d = jnp.minimum(nt.maxstep_scaled(S, dzs), _pos_step(kappa, dkappa))
        amax = jnp.minimum(amax_p, amax_d)
        alpha = jnp.minimum(gamma * amax, 1.0)
        if pars.wr:
            # wide-region acceptance (wregion.m:136-150): largest batched
            # trial step keeping delta(v) <= beta; never larger than the
            # fraction-to-boundary step.
            lam_cv = nt.lam_as_conevec(S)
            t_wr, _ = wr.widelen_batched(
                lam_cv, dxs, dzs, tau, dtau, kappa, dkappa,
                alpha, pars.theta, pars.beta,
            )
            alpha = jnp.minimum(alpha, t_wr)

        tp = td = alpha
        if pars.stepdif:
            # Primal/dual step-length differentiation (stepdif.m:39-175 +
            # trydif.m): pick (tp, td) on a candidate grid minimizing a
            # weighted merit of primal residual, dual residual and
            # complementarity.  All residual norms are closed-form bilinear
            # functions of (tp, td) via 9 precomputed inner products, so
            # the grid search is pure scalar arithmetic; the equal-step
            # alpha is in the grid, so differentiation can only improve the
            # merit (the accept/reject role of trydif.m:40-72).
            dAx = dax_full[:m] - b * dtau               # d/dtp of rp
            u1 = cv_add(aop.adj_y(dy, jnp.zeros((), dtype)), dz)   # d/dtd of rd
            u2 = aop.adj(jnp.concatenate([jnp.zeros((m,), dtau.dtype),
                                          jnp.reshape(dtau, (1,))]))  # c*dtau
            rr = jnp.vdot(rp, rp)
            ra = jnp.vdot(rp, dAx)
            aa = jnp.vdot(dAx, dAx)
            dd = cv_dot(rd, rd)
            d1 = cv_dot(rd, u1)
            d2 = cv_dot(rd, u2)
            e11 = cv_dot(u1, u1)
            e12 = cv_dot(u1, u2)
            e22 = cv_dot(u2, u2)
            xz = gap
            xdz = cv_dot(x, dz)
            zdx = cv_dot(z, dx)
            dxdz = cv_dot(dx, dz)

            fr = jnp.asarray([1.0, 0.95, 0.85, 0.7, 0.5], dtype)
            tps = jnp.concatenate([fr * jnp.minimum(gamma * amax_p, 1.0),
                                   jnp.reshape(alpha, (1,))])
            tds = jnp.concatenate([fr * jnp.minimum(gamma * amax_d, 1.0),
                                   jnp.reshape(alpha, (1,))])
            TP = tps[:, None]
            TD = tds[None, :]
            rp2 = rr + 2 * TP * ra + TP**2 * aa
            rd2 = (dd + 2 * TD * d1 - 2 * TP * d2
                   + TD**2 * e11 - 2 * TP * TD * e12 + TP**2 * e22)
            gap_t = (xz + TP * zdx + TD * xdz + TP * TD * dxdz
                     + (tau + TP * dtau) * (kappa + TD * dkappa))
            tau_t = tau + TP * dtau
            w1, w2 = pars.w
            merit = (w1 * jnp.sqrt(jnp.maximum(rp2, 0.0))
                     + w2 * jnp.sqrt(jnp.maximum(rd2, 0.0))
                     + gap_t) / tau_t
            # only accept pairs that do not increase complementarity beyond
            # the equal-step value (safeguard, trydif-style)
            gap_eq = (xz + alpha * (zdx + xdz) + alpha**2 * dxdz
                      + (tau + alpha * dtau) * (kappa + alpha * dkappa))
            ok_gap = gap_t <= jnp.maximum(1.25 * gap_eq, 0.0)
            merit = jnp.where(ok_gap, merit, jnp.inf)
            flat = jnp.argmin(merit)
            ti, tj = jnp.unravel_index(flat, merit.shape)
            tp = tps[ti]
            td = tds[tj]
            if pars.wr:
                # trydif.m:40-72 — accept the differentiated step only if
                # the candidate iterate stays in the wide region: recompute
                # the product spectra at (tp, td) and run the iswnbr
                # proximity test; reject back to the equal step otherwise.
                lam_cv2 = nt.lam_as_conevec(S)
                xs_c = jax.tree_util.tree_map(
                    lambda a, d_: a + tp * d_, lam_cv2, dxs)
                zs_c = jax.tree_util.tree_map(
                    lambda a, d_: a + td * d_, lam_cv2, dzs)
                wspec = wr.prod_spectrum(xs_c, zs_c)
                wtk = (tau + tp * dtau) * (kappa + td * dkappa)
                dl, _, _ = wr.iswnbr(
                    jnp.concatenate([wspec, wtk[None]]), pars.theta)
                ok_dif = dl <= pars.beta
                tp = jnp.where(ok_dif, tp, alpha)
                td = jnp.where(ok_dif, td, alpha)

        new = IPMState(
            x=jax.tree_util.tree_map(lambda a, d: a + tp * d, x, dx),
            y=y + td * dy,
            z=jax.tree_util.tree_map(lambda a, d: a + td * d, z, dz),
            tau=tau + tp * dtau,
            kappa=kappa + td * dkappa,
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
            err_p=res_p / tau / (1.0 + normb),
            err_d=res_d / tau / (1.0 + normc),
            gap_rel=jnp.abs(cxs - bys) / (1.0 + jnp.abs(cxs) + jnp.abs(bys)),
            cx=cx * cscale,
            by=by * cscale,
            tau=tau,
            kappa=kappa,
            chol_ok=fac_ok,
            res_p_abs=res_p,
            res_d_abs=res_d,
            dir_defect=dir_defect,
        )
        return new, stats

    return step
