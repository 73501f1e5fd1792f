"""Schur-complement formation: M = [A; c'] H [A; c']' as fused matmuls.

Reference analog: getDAtm.m + getada.m / getada1-3.c + spscale.c — the
per-iteration "HOT: Schur form" step (sedumi.m:442-453).  The TPU design
(SURVEY.md section 7 item 3) computes, per cone family,

  LP:   M += (Al * d) @ Al'
  SOC:  H_c = eta2_c (2 wb_c wb_c' - J)  per cone, so
        M += 2 * U diag(eta2) U'  -  (Aq * eta2 * jsign) : Aq
        with U[m,c] = <Aq[m,c,:], wb[c,:]>
  PSD:  B[m,k] = R_k' A[m,k] R_k   (batched congruence, two MXU matmuls)
        M += reshape(B) @ reshape(B)'

All three are dense batched contractions; XLA fuses the scaling into the
matmuls.  The augmented row m carries c, so M contains A H A' (=:ADA),
A H c and c'Hc in one product — the three quantities the self-dual
direction solve needs (sedumi.m:442-466, sddir.m:57-63).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .nt import Scaling
from .opA import DenseAOp


def build_schur(aop: DenseAOp, S: Scaling) -> jax.Array:
    """Return the (m+1) x (m+1) augmented Schur complement."""
    mp1 = aop.m + 1
    dtype = aop.Al.dtype
    M = jnp.zeros((mp1, mp1), dtype)

    if aop.Al.shape[1]:
        M = M + jnp.einsum("mi,i,ni->mn", aop.Al, S.d_l, aop.Al)

    for aq, wb, eta2 in zip(aop.Aq, S.q_wb, S.q_eta2):
        u = jnp.einsum("mcd,cd->mc", aq, wb)
        M = M + 2.0 * jnp.einsum("mc,c,nc->mn", u, eta2, u)
        jsign = jnp.ones(aq.shape[-1], dtype).at[1:].set(-1.0)
        g = aq * (eta2[None, :, None] * jsign[None, None, :])
        M = M - jnp.einsum("mcd,ncd->mn", g, aq)

    for as_, r in zip(aop.As, S.s_r):
        t = jnp.einsum("mkab,kbc->mkac", as_, r)
        bmat = jnp.einsum("kba,mkbc->mkac", r, t)
        bf = bmat.reshape(mp1, -1)
        M = M + bf @ bf.T

    return M
