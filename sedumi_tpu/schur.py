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
from .opA import CooAOp, DenseAOp


def build_schur(aop, S: Scaling) -> jax.Array:
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

    if isinstance(aop, CooAOp):
        for part, (rep, k, d, G, pad2, T), r in zip(
                aop.s_parts, aop.s_meta, S.s_r):
            if rep == "dense":
                M = M + _psd_contrib(part["mat"], k, d, r)
            elif T:
                M = M + _psd_contrib_coo(part, k, d, G, pad2, mp1, r)
    else:
        for as_, (k, d), r in zip(aop.As, aop.s_shapes, S.s_r):
            M = M + _psd_contrib(as_, k, d, r)

    return M


def _psd_contrib_coo(part, k: int, d: int, G: int, pad2: int, mp1: int,
                     r: jax.Array, chunk_elems: float = 6e7) -> jax.Array:
    """Sparse PSD Schur contribution (reference: getada3.c + spscale.c).

    With W = R R' (the NT quadratic-representation metric, H = W (.) W),
      M[i, j] = <A_i, W A_j W> = sum_{t in nz(A_i)} v_t * B~[j][loc_t],
      B~[j]   = W A_j W          (block-diagonal over the bucket's blocks).
    B~ is built from nonzeros only:  W A_j^blk W = sum_t v_t W[:,p_t] W[q_t,:]
    as one batched [pad2,d]x[pad2,d] GEMM per (row, block) group — cost
    O(nnz * d^2) instead of the dense congruence's O((m+1) * d^3 * k).
    """
    W = jnp.einsum("kab,kcb->kac", r, r)           # [k,d,d] symmetric
    g_blk, gp, gq, gv = part["g_blk"], part["gp"], part["gq"], part["gv"]

    def outer(blk, p, q, v):
        wp = W[blk[:, None], :, p] * v[..., None]  # [g, pad2, d]
        wq = W[blk[:, None], q, :]                 # [g, pad2, d]
        return jnp.einsum("gtd,gte->gde", wp, wq)  # [g, d, d]

    btf = jnp.zeros((mp1 * k, d, d), W.dtype)
    gchunk = max(1, int(chunk_elems // max(pad2 * d, 1)))
    for st in range(0, G, gchunk):
        en = min(st + gchunk, G)
        bg = outer(g_blk[st:en], gp[st:en], gq[st:en], gv[st:en])
        idx = part["g_row"][st:en].astype(jnp.int32) * k + g_blk[st:en]
        btf = btf.at[idx].add(bg)
    btf_flat = btf.reshape(mp1, k * d * d)
    tmp = btf_flat[:, part["b_loc"]] * part["b_val"][None, :]   # [mp1, T]
    return jax.ops.segment_sum(tmp.T, part["b_row"], num_segments=mp1,
                               indices_are_sorted=True)


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
