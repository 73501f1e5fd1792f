"""Batched Jordan-algebra kernels for the three symmetric-cone families.

TPU-native replacement for the reference's per-block cone kernels
(psdeig.m, psdfactor.m, psdscale.m, psdjmul.m, psdinvjmul.c, qjmul.m,
qinvjmul.m, tdet.m, maxstep.m): every op acts on a whole *bucket* of
same-size blocks at once as a dense batched array op, so XLA maps it onto
the MXU / batched LAPACK-style kernels instead of looping over blocks.

Conventions (internal; the user-facing sqrt(2) normalization of eigK.m:82-103
is applied only in userapi.py):

* LP part: arrays [n]; everything elementwise.
* Lorentz (SOC) part: arrays [n, d], cone = {x : x[0] >= ||x[1:]||}.
  Identity e = (1, 0, .., 0); Jordan product x o y = (x.y ; x0*ybar+y0*xbar);
  eigenvalues lam± = x0 ± ||xbar||; det = lam+ lam- = x'Jx with
  J = diag(1,-1,..,-1).
* PSD part: arrays [n, d, d] symmetric; Jordan product (XY+YX)/2;
  eigenvalues = eigh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .linalg_ops import eigh as _eigh_impl, eigvalsh as _eigvalsh_impl


# ---------------------------------------------------------------------------
# Lorentz (second-order cone) family — batched over [n, d]
# ---------------------------------------------------------------------------


def q_jdot(x: jax.Array, y: jax.Array) -> jax.Array:
    """x' J y with J=diag(1,-1,..,-1); q_jdot(x,x) = 2*det (reference tdet.m)."""
    return x[..., 0] * y[..., 0] - jnp.sum(x[..., 1:] * y[..., 1:], axis=-1)


def q_tdet(x: jax.Array) -> jax.Array:
    return q_jdot(x, x)


def q_norm_bar(x: jax.Array) -> jax.Array:
    """||x[1:]|| per cone."""
    return jnp.sqrt(jnp.sum(x[..., 1:] ** 2, axis=-1))


def q_eig(x: jax.Array) -> jax.Array:
    """Eigenvalues [n, 2] = (x0 - ||xbar||, x0 + ||xbar||)."""
    nb = q_norm_bar(x)
    return jnp.stack([x[..., 0] - nb, x[..., 0] + nb], axis=-1)


def q_jmul(x: jax.Array, y: jax.Array) -> jax.Array:
    """Jordan (arrow) product x o y (reference: qjmul.m)."""
    head = jnp.sum(x * y, axis=-1)
    tail = x[..., :1] * y[..., 1:] + y[..., :1] * x[..., 1:]
    return jnp.concatenate([head[..., None], tail], axis=-1)


def q_inv(x: jax.Array) -> jax.Array:
    """Jordan inverse: x^{-1} = Jx / det(x)."""
    det = q_jdot(x, x)
    jx = jnp.concatenate([x[..., :1], -x[..., 1:]], axis=-1)
    return jx / det[..., None]


def q_inv_jmul(x: jax.Array, r: jax.Array) -> jax.Array:
    """Solve x o u = r (reference: qinvjmul.m).

    Arrow-matrix inverse closed form: with det = x0^2-||xbar||^2,
      u0   = (x0 r0 - xbar.rbar) / det
      ubar = (-r0 xbar + (det/x0) rbar + (xbar.rbar/x0) xbar) / det
    """
    x0 = x[..., 0]
    xb = x[..., 1:]
    r0 = r[..., 0]
    rb = r[..., 1:]
    det = q_jdot(x, x)
    xr = jnp.sum(xb * rb, axis=-1)
    u0 = (x0 * r0 - xr) / det
    ub = (-r0[..., None] * xb + (det / x0)[..., None] * rb + (xr / x0)[..., None] * xb) / det[..., None]
    return jnp.concatenate([u0[..., None], ub], axis=-1)


def q_sqrt(x: jax.Array) -> jax.Array:
    """Spectral square root of x in int(Q)."""
    lam = q_eig(x)
    sm, sp = jnp.sqrt(lam[..., 0]), jnp.sqrt(lam[..., 1])
    nb = q_norm_bar(x)
    head = 0.5 * (sp + sm)
    # xbar/||xbar|| * (sp-sm)/2 ; safe when ||xbar|| = 0 (then sp=sm).
    scale = jnp.where(nb > 0, 0.5 * (sp - sm) / jnp.where(nb > 0, nb, 1.0), 0.0)
    tail = scale[..., None] * x[..., 1:]
    return jnp.concatenate([head[..., None], tail], axis=-1)


def q_quad_rep_apply(u: jax.Array, z: jax.Array) -> jax.Array:
    """P(u) z = 2 u (u'z) - (u'Ju) Jz — quadratic representation apply."""
    uz = jnp.sum(u * z, axis=-1)
    uju = q_jdot(u, u)
    jz = jnp.concatenate([z[..., :1], -z[..., 1:]], axis=-1)
    return 2.0 * u * uz[..., None] - uju[..., None] * jz


def q_remap(x: jax.Array, vals: jax.Array) -> jax.Array:
    """Rebuild a Lorentz vector from new spectral values on x's own frame.

    vals [..., 2] aligned with q_eig's (lam-, lam+) order: returns
    sum_i vals_i * f_i with f_i = (1, -+ xbar/||xbar||)/2 the frame of x.
    Used for spectral targets that share the current point's frame (the
    wide-region projection vTAR of wregion.m:48, built per spectral value).
    """
    nb = q_norm_bar(x)
    head = 0.5 * (vals[..., 0] + vals[..., 1])
    scale = jnp.where(nb > 0, 0.5 * (vals[..., 1] - vals[..., 0])
                      / jnp.where(nb > 0, nb, 1.0), 0.0)
    tail = scale[..., None] * x[..., 1:]
    return jnp.concatenate([head[..., None], tail], axis=-1)


def q_maxstep(x: jax.Array, dx: jax.Array) -> jax.Array:
    """Per-cone sup {a >= 0 : x + t*dx in Q for all t in [0,a]} for x in int(Q).

    Needs head >= 0 and det >= 0 along the segment (reference maxstep.m:48-58
    computes the same via an eigen-quadratic).  Returns +inf where unbounded.
    """
    big = jnp.asarray(jnp.inf, x.dtype)
    # head condition x0 + a dx0 >= 0
    a_head = jnp.where(dx[..., 0] < 0, -x[..., 0] / dx[..., 0], big)
    # det condition: q(a) = det(dx) a^2 + 2 jdot(x,dx) a + det(x) >= 0,
    # det(x) > 0 at a=0; first positive root (if any) bounds the step.
    a2 = q_jdot(dx, dx)
    a1 = q_jdot(x, dx)
    a0 = q_jdot(x, x)
    disc = a1 * a1 - a2 * a0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # Numerically stable smallest-positive-root selection.
    # Roots of a2 t^2 + 2 a1 t + a0 = 0:  t = (-a1 ± sq)/a2  = a0 / (-a1 ∓ sq)
    denom = -a1 + sq
    root_stable = jnp.where(denom > 0, a0 / denom, big)  # smallest positive root form
    has_root = disc >= 0
    # If a2 >= 0 and a1 >= 0: q increasing & convex: no positive root.
    no_pos = jnp.logical_or(~has_root, jnp.logical_and(a1 >= 0, a2 >= 0))
    a_det = jnp.where(no_pos, big, jnp.maximum(root_stable, 0.0))
    return jnp.minimum(a_head, a_det)


# ---------------------------------------------------------------------------
# PSD family — batched over [n, d, d]
# ---------------------------------------------------------------------------


def s_eig(x: jax.Array) -> jax.Array:
    """Batched eigenvalues of symmetric blocks (reference psdeig.m)."""
    return _eigvalsh_impl(x)


def s_eigh(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    lam, q = _eigh_impl(x)
    return lam, q


def s_chol(x: jax.Array) -> jax.Array:
    """Batched lower-Cholesky (reference psdfactor.m, which returns upper)."""
    return jnp.linalg.cholesky(x)


def s_jmul(x: jax.Array, y: jax.Array) -> jax.Array:
    """(XY + YX)/2 (reference psdjmul.m)."""
    xy = jnp.matmul(x, y)
    return 0.5 * (xy + jnp.swapaxes(xy, -1, -2))


def s_inv_jmul_diag(lam: jax.Array, r: jax.Array) -> jax.Array:
    """Solve Lam o U = R when Lam = diag(lam): U_ij = 2 R_ij/(lam_i+lam_j).

    This is the scaled-space specialization of psdinvjmul.c — after NT
    scaling the scaled point is diagonal, so the inverse Jordan product is
    elementwise (no Householder frames needed).
    """
    denom = lam[..., :, None] + lam[..., None, :]
    return 2.0 * r / denom


def s_congr(r: jax.Array, x: jax.Array) -> jax.Array:
    """R' X R batched (reference psdscale.m computes U'XU per block)."""
    return jnp.einsum("...ba,...bc,...cd->...ad", r, x, r)


def s_congr_t(r: jax.Array, x: jax.Array) -> jax.Array:
    """R X R' batched."""
    return jnp.einsum("...ab,...bc,...dc->...ad", r, x, r)


def s_maxstep_scaled(lam: jax.Array, dxs: jax.Array) -> jax.Array:
    """Per-block sup step for Lam + t*dXs >= 0, Lam = diag(lam) > 0.

    = 1 / max(0, -lambda_min(Lam^-1/2 dXs Lam^-1/2)); batched eigvalsh
    (reference maxstep.m:62-66 does psdinvscale + minpsdeig per block).
    """
    isq = 1.0 / jnp.sqrt(lam)
    m = dxs * isq[..., :, None] * isq[..., None, :]
    lmin = jnp.min(_eigvalsh_impl(m), axis=-1)
    big = jnp.asarray(jnp.inf, lam.dtype)
    return jnp.where(lmin < 0, -1.0 / jnp.minimum(lmin, -jnp.finfo(lam.dtype).tiny), big)


# ---------------------------------------------------------------------------
# LP family — elementwise [n]
# ---------------------------------------------------------------------------


def l_maxstep(x: jax.Array, dx: jax.Array) -> jax.Array:
    """sup step for x + t dx >= 0 elementwise; min over the block batch."""
    big = jnp.asarray(jnp.inf, x.dtype)
    steps = jnp.where(dx < 0, -x / dx, big)
    return jnp.min(steps, initial=big)
