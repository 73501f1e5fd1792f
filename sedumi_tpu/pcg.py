"""Compensated (double-double) linear-solve refinement and PCG.

Reference analog: wrapPcg.m / loopPcg.m / quadadd.c — the reference
accumulates the PCG solution in double-double ("quad") precision when
cg.qprec=1 and falls back to the best residual seen.  On TPU/f64 the same
trick breaks the iterative-refinement floor: the residual  r = b - M v  is
evaluated with error ~ eps*||M||*||v||, which caps achievable accuracy at
cond(M)*eps; computing it with error-free transformations (TwoSum /
Dekker-split TwoProd, all plain f64 ops — no FMA dependence) pushes the
floor down by another ~2^27.

All functions are jit-compatible elementwise/matmul compositions.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .chol import CholFactor, chol_solve
from .fp import split_const


def two_sum(a, b):
    """Error-free sum: a+b = s + e exactly."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def _split(a):
    c = split_const(a.dtype) * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Error-free product: a*b = p + e exactly (Dekker)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dd_add(hi, lo, b):
    """(hi,lo) + b -> (hi,lo) double-double (quadadd.c analog)."""
    s, e = two_sum(hi, b)
    return s, lo + e


def dd_matvec_residual(M: jax.Array, v: jax.Array, rhs: jax.Array) -> jax.Array:
    """rhs - M v evaluated in compensated arithmetic, rounded to f64.

    Each product M_ij v_j is split error-free; the row sums accumulate the
    high parts with cancellation-compensated summation and add the low
    parts separately.  Error ~ eps^2 * ||M v|| instead of eps * ||M v||.
    """
    p, e = two_prod(M, v[None, :])
    # Compensated (Neumaier) summation of p along axis 1, plus all errors.
    def body(j, carry):
        s, comp = carry
        x = p[:, j]
        t, err = two_sum(s, x)
        return (t, comp + err)

    n = M.shape[1]
    s0 = jnp.zeros(M.shape[0], M.dtype)
    s, comp = jax.lax.fori_loop(0, n, body, (s0, s0))
    total_lo = comp + jnp.sum(e, axis=1)
    # rhs - (s + lo)
    d, derr = two_sum(rhs, -s)
    return d + (derr - total_lo)


def refine_solve_dd(
    M: jax.Array,
    f,
    rhs: jax.Array,
    iters: int = 3,
) -> jax.Array:
    """Iterative refinement with compensated residuals and double-double
    solution accumulation (the role of loopPcg.m:100-124 + quadadd.c).

    `f` is either a chol.CholFactor or a callable b -> approximate solve."""
    solve = f if callable(f) else (lambda b: chol_solve(f, b))
    x_hi = solve(rhs)
    x_lo = jnp.zeros_like(x_hi)

    def body(_, carry):
        hi, lo = carry
        r = dd_matvec_residual(M, hi, rhs)
        r = r - M @ lo
        d = solve(r)
        s, e = two_sum(hi, d)
        return s, lo + e

    x_hi, x_lo = jax.lax.fori_loop(0, iters, body, (x_hi, x_lo))
    return x_hi + x_lo


class PcgResult(NamedTuple):
    x: jax.Array
    resnorm: jax.Array
    iters: jax.Array


def pcg(
    matvec: Callable[[jax.Array], jax.Array],
    precond: Callable[[jax.Array], jax.Array],
    rhs: jax.Array,
    x0: jax.Array,
    maxiter: int = 49,
    restol: float = 5e-3,
    stagtol: float = 5e-14,
    abstol=0.0,
) -> PcgResult:
    """Preconditioned CG with double-double solution accumulation and
    best-residual fallback (wrapPcg.m:94-130, loopPcg.m:126-146).

    Solves matvec(x) = rhs; `precond` applies an approximate inverse
    (e.g. the possibly pivot-skipped Cholesky).  Bounded lax.while_loop:
    stops on residual <= max(restol * ||rhs||, abstol), stagnation, or
    maxiter.  `abstol` carries the reference's scale-relative acceptance
    (wrapPcg.m:46: restol = y0 * cgpars.restol is ABSOLUTE, shrinking with
    the iterate's residual scale y0); `restol` is the engine's relative
    floor.
    """
    bnorm = jnp.linalg.norm(rhs)
    tol = jnp.maximum(restol * bnorm, jnp.asarray(abstol, bnorm.dtype))

    def cond(c):
        (x_hi, x_lo, r, p, rz, it, best_x, best_rn, done) = c
        return jnp.logical_and(it < maxiter, jnp.logical_not(done))

    def body(c):
        (x_hi, x_lo, r, p, rz, it, best_x, best_rn, done) = c
        mp = matvec(p)
        pmp = p @ mp
        alpha = rz / jnp.where(pmp != 0, pmp, 1.0)
        # double-double accumulation of x (quadadd.c)
        s, e = two_sum(x_hi, alpha * p)
        x_hi, x_lo = s, x_lo + e
        r = r - alpha * mp
        z = precond(r)
        rz_new = r @ z
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + beta * p
        rn = jnp.linalg.norm(r)
        better = rn < best_rn
        best_x = jnp.where(better, x_hi + x_lo, best_x)
        best_rn = jnp.where(better, rn, best_rn)
        done = jnp.logical_or(rn <= tol, jnp.abs(rz_new) < stagtol * bnorm**2)
        return (x_hi, x_lo, r, p, rz_new, it + 1, best_x, best_rn, done)

    r0 = rhs - matvec(x0)
    z0 = precond(r0)
    init = (x0, jnp.zeros_like(x0), r0, z0, r0 @ z0, jnp.asarray(0),
            x0, jnp.linalg.norm(r0), jnp.asarray(False))
    (x_hi, x_lo, r, p, rz, it, best_x, best_rn, done) = jax.lax.while_loop(
        cond, body, init
    )
    final_rn = jnp.linalg.norm(r)
    use_final = final_rn <= best_rn
    x = jnp.where(use_final, x_hi + x_lo, best_x)
    rn = jnp.minimum(final_rn, best_rn)
    return PcgResult(x=x, resnorm=rn, iters=it)
