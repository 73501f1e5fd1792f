"""Batched symmetric eigensolver: parallel-order cyclic Jacobi in pure lax.

Why: XLA:TPU's built-in eigh (QDWH-based) compiles enormous unrolled
programs — 10+ minutes for a single 174x174 f64 instance over the tunnel —
while the IPM step needs several eigh/eigvalsh instances per PSD bucket.
This implementation is a small static lax.fori_loop graph (compiles in
seconds) built from gathers + elementwise rotations, and batches over the
cone-block axis.

Algorithm: classical two-sided Jacobi with the round-robin ("tournament")
parallel ordering: each round rotates n/2 disjoint pivot pairs
simultaneously; n-1 rounds visit every pair once (one sweep).  Cyclic
Jacobi converges quadratically; `sweeps` is static (default tuned for f64
machine precision at n <= ~600).

The rotation J(p,q): G[pp]=G[qq]=c, G[pq]=s, G[qp]=-s, A <- G' A G with
(c,s) chosen to annihilate A[p,q] (the numerically stable half-angle
formulas).  V accumulates the product of rotations; eigenvectors are the
columns of V: A_orig = V diag(w) V'.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .fp import eps_for


def _round_robin_schedule(n: int) -> np.ndarray:
    """[n-1, n/2, 2] pivot pairs (p<q), round-robin tournament (n even)."""
    assert n % 2 == 0
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        pairs = [
            (min(players[i], players[n - 1 - i]), max(players[i], players[n - 1 - i]))
            for i in range(n // 2)
        ]
        rounds.append(pairs)
        players = [players[0]] + [players[-1]] + players[1:-1]
    return np.asarray(rounds, np.int32)


@partial(jax.jit, static_argnames=("sweeps", "with_vectors", "sort"))
def _jacobi(A: jax.Array, sweeps: int, with_vectors: bool, sort: bool):
    n0 = A.shape[-1]
    batch = A.shape[:-2]
    n = n0 + (n0 % 2)
    if n != n0:
        # pad with a decoupled unit diagonal entry (rotations with a zero
        # off-diagonal are the identity, so the padding never mixes in)
        pad = [(0, 0)] * len(batch) + [(0, 1), (0, 1)]
        A = jnp.pad(A, pad)
        A = A.at[..., n0, n0].set(1.0)
    sched = jnp.asarray(_round_robin_schedule(n))  # [n-1, n/2, 2]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), batch + (n, n))
    V = eye

    def round_body(r, carry):
        A, V = carry
        pq = jax.lax.dynamic_index_in_dim(sched, r, 0, keepdims=False)
        p = pq[:, 0]
        q = pq[:, 1]
        app = A[..., p, p]
        aqq = A[..., q, q]
        apq = A[..., p, q]
        # stable Jacobi rotation annihilating apq.  Thresholds must target
        # the precision the platform ACTUALLY computes at (fp.eps_for):
        # fake-f64 constants like finfo(f64).tiny flush to zero in f32
        # compute and the rotation formulas overflow — the NaN source on
        # TPU backends.
        ueps = eps_for(A.dtype)
        small = jnp.abs(apq) <= 0.25 * ueps * (jnp.abs(app) + jnp.abs(aqq))
        theta = (aqq - app) / (2.0 * jnp.where(small, 1.0, apq))
        # |theta| beyond 1/ueps rotates below roundoff; clamping keeps
        # theta*theta finite in f32 without changing the computed t.
        theta_c = jnp.clip(theta, -1.0 / ueps, 1.0 / ueps)
        t = jnp.sign(theta_c) / (jnp.abs(theta_c) + jnp.sqrt(1.0 + theta_c * theta_c))
        t = jnp.where(theta == 0.0, 1.0, t)  # 45-degree rotation when equal
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        c = jnp.where(small, 1.0, c)
        s = jnp.where(small, 0.0, s)

        cb = c[..., :, None]
        sb = s[..., :, None]
        # rows: A <- G' A
        rows_p = A[..., p, :]
        rows_q = A[..., q, :]
        new_p = cb * rows_p - sb * rows_q
        new_q = sb * rows_p + cb * rows_q
        A = A.at[..., p, :].set(new_p)
        A = A.at[..., q, :].set(new_q)
        # cols: A <- A G
        cols_p = A[..., :, p]
        cols_q = A[..., :, q]
        cT = c[..., None, :]
        sT = s[..., None, :]
        A = A.at[..., :, p].set(cT * cols_p - sT * cols_q)
        A = A.at[..., :, q].set(sT * cols_p + cT * cols_q)
        if with_vectors:
            vp = V[..., :, p]
            vq = V[..., :, q]
            V = V.at[..., :, p].set(cT * vp - sT * vq)
            V = V.at[..., :, q].set(sT * vp + cT * vq)
        return A, V

    # Adaptive sweep count: cyclic Jacobi converges quadratically, so
    # mid-run well-conditioned batches finish in 4-6 sweeps while the
    # static budget is sized for the worst case (10-14).  Each sweep is
    # n-1 SEQUENTIAL rotation rounds — the latency that dominates NT
    # scaling on TPU — so stopping on a measured off-diagonal norm
    # (relative to the diagonal scale, max over the batch) cuts the hot
    # kernel's critical path roughly in half at equal accuracy.  The
    # while_loop is bounded by the static `sweeps` worst case.
    ueps0 = eps_for(A.dtype)

    idx_n = jnp.arange(n)

    def _off(Acur):
        # zero the diagonal BEFORE summing: computing sum(A^2)-sum(d^2)
        # cancels catastrophically and floors the estimate at
        # sqrt(eps)*||A|| (measured: stopped at off ~ 7e-8 relative)
        d = jnp.diagonal(Acur, axis1=-2, axis2=-1)
        dn = jnp.sqrt(jnp.sum(d * d, axis=-1))
        Ao = Acur.at[..., idx_n, idx_n].set(0.0)
        off = jnp.sqrt(jnp.sum(Ao * Ao, axis=(-2, -1)))
        return jnp.max(off / jnp.maximum(dn, jnp.asarray(1e-30, Acur.dtype)))

    # threshold 8*eps*sqrt(n): the achievable off/||diag|| floor scales
    # like sqrt(n)*eps (measured on TPU f32 at n=176: floor 2.85e-6 =
    # 1.8*sqrt(n)*eps; a bare 4*eps threshold never fires and the loop
    # always runs its full worst-case budget)
    thresh = 8.0 * ueps0 * float(np.sqrt(n))

    def sweep_cond(carry):
        A_, V_, i = carry
        return jnp.logical_and(i < sweeps,
                               jnp.logical_or(i < 2, _off(A_) > thresh))

    def sweep_body(carry):
        A_, V_, i = carry
        A_, V_ = jax.lax.fori_loop(0, n - 1, round_body, (A_, V_))
        return A_, V_, i + 1

    A, V, _ = jax.lax.while_loop(sweep_cond, sweep_body,
                                 (A, V, jnp.asarray(0, jnp.int32)))
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    w = w[..., :n0] if n != n0 else w
    if with_vectors:
        V = V[..., :n0, :n0] if n != n0 else V
    if sort:
        # NOTE: jnp.sort compiles pathologically slowly on TPU (~30s for a
        # tiny array); nothing in the IPM hot path needs ordered
        # eigenvalues, so sorting is opt-in (user-facing eigK only).
        order = jnp.argsort(w, axis=-1)
        w = jnp.take_along_axis(w, order, axis=-1)
        if with_vectors:
            V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V if with_vectors else None


def _sweeps_for(n: int, dtype=None) -> int:
    """Static sweep count for convergence to the DTYPE's roundoff floor.

    f64 counts are tuned for machine precision at n <= ~600.  f32 inputs
    converge ~2 sweeps earlier (quadratic convergence targets eps32 ~
    1.2e-7; measured at n=174: 10 sweeps reach the 3.5e-5 plateau that 12
    also reaches) — and every sweep is n-1 SEQUENTIAL rotation rounds, the
    latency-bound cost that dominates NT scaling on TPU.
    """
    f32 = dtype is not None and jnp.dtype(dtype) == jnp.float32
    if n <= 16:
        return 6 if f32 else 8
    if n <= 64:
        return 8 if f32 else 10
    if n <= 256:
        return 10 if f32 else 12
    return 12 if f32 else 14


@partial(jax.jit, static_argnames=("sweeps", "with_vectors"))
def _jacobi_herm(A: jax.Array, sweeps: int, with_vectors: bool):
    """Two-sided Jacobi for batched complex HERMITIAN matrices.

    The native path for K.scomplex blocks (reference: psdeig.m:64-67
    complex branch): a Hermitian block of order d diagonalizes in d-1
    rotation rounds per sweep versus 2d-1 for its real embedding — the
    sequential round count is the TPU latency driver, so the complex path
    halves the critical path AND the per-round element count.  The
    rotation generalizes the real half-angle formulas with the pivot's
    phase u = a_pq/|a_pq| folded into the sine.
    """
    n0 = A.shape[-1]
    batch = A.shape[:-2]
    n = n0 + (n0 % 2)
    if n != n0:
        pad = [(0, 0)] * len(batch) + [(0, 1), (0, 1)]
        A = jnp.pad(A, pad)
        A = A.at[..., n0, n0].set(1.0)
    sched = jnp.asarray(_round_robin_schedule(n))
    rdt = jnp.float32 if A.dtype == jnp.complex64 else jnp.float64
    V = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), batch + (n, n))
    ueps = eps_for(rdt)

    def round_body(r, carry):
        A, V = carry
        pq = jax.lax.dynamic_index_in_dim(sched, r, 0, keepdims=False)
        p = pq[:, 0]
        q = pq[:, 1]
        app = jnp.real(A[..., p, p])
        aqq = jnp.real(A[..., q, q])
        apq = A[..., p, q]
        mag = jnp.abs(apq)
        small = mag <= 0.25 * ueps * (jnp.abs(app) + jnp.abs(aqq))
        u = apq / jnp.where(small, 1.0, mag).astype(A.dtype)  # phase e^{i phi}
        u = jnp.where(small, jnp.ones_like(u), u)
        theta = (aqq - app) / (2.0 * jnp.where(small, 1.0, mag))
        theta_c = jnp.clip(theta, -1.0 / ueps, 1.0 / ueps)
        t = jnp.sign(theta_c) / (jnp.abs(theta_c)
                                 + jnp.sqrt(1.0 + theta_c * theta_c))
        t = jnp.where(theta == 0.0, 1.0, t)
        c = (1.0 / jnp.sqrt(1.0 + t * t))
        s = t * c
        c = jnp.where(small, 1.0, c).astype(A.dtype)
        su = jnp.where(small, 0.0, s).astype(A.dtype) * u   # s * e^{i phi}
        # unitary G: G[pp]=c, G[qq]=c, G[pq]=s*u, G[qp]=-s*conj(u);
        # A <- G^H A G annihilates a_pq (verified against LAPACK in tests)
        # A <- G^H A G with G = [[c, s*u], [-s*conj(u), c]] in the (p,q)
        # plane: rows get G^H from the left, columns G from the right
        cb = c[..., :, None]
        sb = su[..., :, None]
        rows_p = A[..., p, :]
        rows_q = A[..., q, :]
        new_p = cb * rows_p - sb * rows_q
        new_q = jnp.conj(sb) * rows_p + cb * rows_q
        A = A.at[..., p, :].set(new_p)
        A = A.at[..., q, :].set(new_q)
        cT = c[..., None, :]
        sT = su[..., None, :]
        cols_p = A[..., :, p]
        cols_q = A[..., :, q]
        A = A.at[..., :, p].set(cT * cols_p - jnp.conj(sT) * cols_q)
        A = A.at[..., :, q].set(sT * cols_p + cT * cols_q)
        if with_vectors:
            vp = V[..., :, p]
            vq = V[..., :, q]
            V = V.at[..., :, p].set(cT * vp - jnp.conj(sT) * vq)
            V = V.at[..., :, q].set(sT * vp + cT * vq)
        return A, V

    idx_n = jnp.arange(n)

    def _off(Acur):
        d = jnp.real(jnp.diagonal(Acur, axis1=-2, axis2=-1))
        dn = jnp.sqrt(jnp.sum(d * d, axis=-1))
        Ao = Acur.at[..., idx_n, idx_n].set(0.0)
        off = jnp.sqrt(jnp.sum(jnp.abs(Ao) ** 2, axis=(-2, -1)))
        return jnp.max(off / jnp.maximum(dn, jnp.asarray(1e-30, dn.dtype)))

    thresh = 8.0 * eps_for(rdt) * float(np.sqrt(n))

    def sweep_cond(carry):
        A_, V_, i = carry
        return jnp.logical_and(i < sweeps,
                               jnp.logical_or(i < 2, _off(A_) > thresh))

    def sweep_body(carry):
        A_, V_, i = carry
        A_, V_ = jax.lax.fori_loop(0, n - 1, round_body, (A_, V_))
        return A_, V_, i + 1

    A, V, _ = jax.lax.while_loop(sweep_cond, sweep_body,
                                 (A, V, jnp.asarray(0, jnp.int32)))
    w = jnp.real(jnp.diagonal(A, axis1=-2, axis2=-1))
    w = w[..., :n0] if n != n0 else w
    if with_vectors:
        V = V[..., :n0, :n0] if n != n0 else V
    return w, V if with_vectors else None


def jacobi_eigh_herm(A: jax.Array, sweeps: int | None = None):
    """(w, V) for batched complex Hermitian A; w real, V unitary,
    A = V diag(w) V^H.  Eigenvalue order unspecified."""
    n = A.shape[-1]
    rdt = jnp.float32 if A.dtype == jnp.complex64 else jnp.float64
    w, V = _jacobi_herm(A, sweeps or _sweeps_for(n, rdt), True)
    return w, V


def coarse_sweeps_for(n: int, dtype=None) -> int:
    """Line-search-grade sweep budget (~1e-3 relative spectra).

    The wide-region proximity test against beta=0.5 (iswnbr), the maxstep
    boundary estimates (protected downstream by the interior backtracking
    probe) and the Gondzio outlier clip need ~3 digits, not machine
    precision; quadratic convergence makes the last 3-4 sweeps pure
    precision polish.  Each sweep is n-1 sequential rotation rounds — the
    TPU latency driver — so the cheap budget is a direct wall-clock cut.
    """
    return max(3, _sweeps_for(n, dtype) - 4)


def jacobi_eigh(A: jax.Array, sweeps: int | None = None, sort: bool = True):
    """(w, V) with A = V diag(w) V'; w ascending iff sort (default)."""
    n = A.shape[-1]
    w, V = _jacobi(A, sweeps or _sweeps_for(n, A.dtype), True, sort)
    return w, V


def jacobi_eigvalsh(A: jax.Array, sweeps: int | None = None,
                    sort: bool = True) -> jax.Array:
    n = A.shape[-1]
    w, _ = _jacobi(A, sweeps or _sweeps_for(n, A.dtype), False, sort)
    return w
