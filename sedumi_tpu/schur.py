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
        M = M + (aop.Al * S.d_l[None, :]) @ aop.Al.T

    for aq, (c, d), wb, eta2 in zip(aop.Aq, aop.q_shapes, S.q_wb, S.q_eta2):
        aq3 = aq.reshape(mp1, c, d)
        u = jnp.einsum("mcd,cd->mc", aq3, wb)
        M = M + 2.0 * jnp.einsum("mc,c,nc->mn", u, eta2, u)
        jsign = jnp.ones(d, dtype).at[1:].set(-1.0)
        w = (eta2[:, None] * jsign[None, :]).reshape(-1)   # [c*d]
        M = M - (aq * w[None, :]) @ aq.T
    for as_, (k, d), r in zip(aop.As, aop.s_shapes, S.s_r):
        M = M + _psd_contrib(as_, k, d, r)

    return M


def _psd_contrib(as_: jax.Array, k: int, d: int, r: jax.Array,
                 chunk: int = 128) -> jax.Array:
    """B B' with B[m, kdd] = vec(R_k' A[m,k] R_k), congruence computed in
    m-chunks so the [m+1, k, d, d] temporaries never materialize whole
    (the full-size intermediates were a 3x HBM blowup on OH-sized data;
    A itself plus one B buffer is the floor).  as_ is flat [m+1, k*d*d]."""
    mp1 = as_.shape[0]
    kdd = k * d * d

    def congr(a):  # [c, kdd] -> [c, kdd]
        a4 = a.reshape(a.shape[0], k, d, d)
        t = jnp.einsum("mkab,kbc->mkac", a4, r)
        return jnp.einsum("kba,mkbc->mkac", r, t).reshape(a.shape[0], kdd)

    if mp1 <= 2 * chunk:
        bf = congr(as_)
    else:
        nch = -(-mp1 // chunk)

        def body(i, bf):
            # clamp the final chunk instead of padding: the overlapped rows
            # recompute identical values, so the update is consistent
            st = jnp.minimum(i * chunk, mp1 - chunk)
            a = jax.lax.dynamic_slice_in_dim(as_, st, chunk, 0)
            return jax.lax.dynamic_update_slice(bf, congr(a), (st, 0))

        bf = jax.lax.fori_loop(
            0, nch, body, jnp.zeros((mp1, kdd), as_.dtype)
        )
    return bf @ bf.T
