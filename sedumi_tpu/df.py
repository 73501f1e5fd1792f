"""Double-float (two-f32) compensated operator products on the accelerator.

The TPU has no native f64; XLA's emulated-f64 GEMV over the bucketed
operator costs seconds per apply at OH scale (measured 13.4 s vs ~2 ms of
HBM time for the same f32 read), which made the on-device hybrid endgame
unusable on large problems.  This module keeps the f64-QUALITY residual
arithmetic the hybrid phase needs (SURVEY.md hard part 1; the role of the
reference's quad-precision accumulation, loopPcg.m:100-108 + quadadd.c)
while running entirely in f32 on the vector unit:

* a double-float number is an unevaluated sum hi + lo of two f32 with
  |lo| <= ulp(hi)/2 (~2^-48 combined relative resolution, ~1e-14 — well
  below the 1e-8 target accuracy on row-equilibrated data);
* products A[i,:] . x are computed with error-free f32 TwoProd (Veltkamp
  splitting — no fma primitive is exposed) and summed with a pairwise
  TwoSum tree, so no f32-accumulation error ever enters;
* ``DfAOp`` wraps the flat bucketed operator (opA.DenseAOp layout) as
  (hi, lo) f32 pairs and exposes the same apply/adj/adj_y contract with
  f64 inputs and outputs: f64 <-> df conversion is exact elementwise
  splitting, cheap even under f64 emulation.

Memory: hi+lo is exactly the f64 operator's footprint, read once per
product; the compute is ~35 VPU flops/element — bandwidth-bound, i.e.
speed-of-light for a GEMV on this hardware.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .structs import ConeVec

_SPLIT32 = np.float32(4097.0)        # 2^12 + 1: Veltkamp constant for f32


def two_sum(a, b):
    """Error-free f32 sum: a + b = s + e exactly (Knuth, 6 flops)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def _veltkamp(a):
    """Split a into hi + lo with 12-bit-mantissa halves (exact)."""
    t = _SPLIT32 * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free f32 product: a * b = p + e exactly (Dekker, 17 flops)."""
    p = a * b
    ah, al = _veltkamp(a)
    bh, bl = _veltkamp(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_split64(a: np.ndarray | jax.Array):
    """f64 -> (hi, lo) f32 pair with hi = f32(a), lo = f32(a - hi)."""
    hi = jnp.asarray(a, jnp.float32)
    lo = jnp.asarray(jnp.asarray(a, jnp.float64)
                     - jnp.asarray(hi, jnp.float64), jnp.float32)
    return hi, lo


def df_to64(hi, lo):
    return jnp.asarray(hi, jnp.float64) + jnp.asarray(lo, jnp.float64)


def _df_reduce_last(hi, lo):
    """Compensated pairwise-tree reduction of df values over the last axis
    (power-of-two padded).  TwoSum on the hi parts per level; the exact
    sum errors fall into lo, which is carried in plain f32 (bounded by
    ulp(hi)^2-level terms)."""
    n = hi.shape[-1]
    while n > 1:
        if n % 2:
            pad = [(0, 0)] * (hi.ndim - 1) + [(0, 1)]
            hi = jnp.pad(hi, pad)
            lo = jnp.pad(lo, pad)
            n += 1
        h0, h1 = hi[..., 0::2], hi[..., 1::2]
        s, e = two_sum(h0, h1)
        hi = s
        lo = lo[..., 0::2] + lo[..., 1::2] + e
        n = hi.shape[-1]
    return hi[..., 0], lo[..., 0]


def df_matvec(Ah, Al, xh, xl, chunk: int = 16384):
    """y = A @ x with A, x, y in double-float: [m, n] @ [n] -> [m] df.

    Chunked over n so the elementwise TwoProd temporaries stay ~m*chunk;
    per chunk an exact-product + compensated-tree reduction, chunks folded
    into the running df accumulator with TwoSum.
    """
    m, n = Ah.shape
    nch = max(1, -(-n // chunk))
    npad = nch * chunk
    if npad != n:
        Ah = jnp.pad(Ah, ((0, 0), (0, npad - n)))
        Al = jnp.pad(Al, ((0, 0), (0, npad - n)))
        xh = jnp.pad(xh, (0, npad - n))
        xl = jnp.pad(xl, (0, npad - n))

    def body(i, acc):
        ah, al = acc
        Ac_h = jax.lax.dynamic_slice(Ah, (0, i * chunk), (m, chunk))
        Ac_l = jax.lax.dynamic_slice(Al, (0, i * chunk), (m, chunk))
        xc_h = jax.lax.dynamic_slice(xh, (i * chunk,), (chunk,))
        xc_l = jax.lax.dynamic_slice(xl, (i * chunk,), (chunk,))
        p, e = two_prod(Ac_h, xc_h[None, :])
        e = e + Ac_h * xc_l[None, :] + Ac_l * xc_h[None, :]
        sh, sl = _df_reduce_last(p, e)
        s, e2 = two_sum(ah, sh)
        return s, al + sl + e2

    zh = jnp.zeros((m,), jnp.float32)
    hi, lo = jax.lax.fori_loop(0, nch, body, (zh, zh))
    return hi, lo


def df_vecmat(xh, xl, Ah, Al, chunk: int = 16384):
    """y = x @ A df: [m] @ [m, n] -> [n].  m is small (the Schur row count)
    so the reduction runs un-chunked over m; n is chunked for memory."""
    m, n = Ah.shape
    nch = max(1, -(-n // chunk))

    def col_block(Ac_h, Ac_l):
        p, e = two_prod(Ac_h, xh[:, None])
        e = e + Ac_h * xl[:, None] + Ac_l * xh[:, None]
        sh, sl = _df_reduce_last(jnp.swapaxes(p, 0, 1), jnp.swapaxes(e, 0, 1))
        return sh, sl

    if nch == 1 and n <= chunk:
        return col_block(Ah, Al)

    npad = nch * chunk
    if npad != n:
        Ah = jnp.pad(Ah, ((0, 0), (0, npad - n)))
        Al = jnp.pad(Al, ((0, 0), (0, npad - n)))

    def body(j, out):
        oh, ol = out
        sh, sl = col_block(
            jax.lax.dynamic_slice(Ah, (0, j * chunk), (m, chunk)),
            jax.lax.dynamic_slice(Al, (0, j * chunk), (m, chunk)))
        oh = jax.lax.dynamic_update_slice(oh, sh, (j * chunk,))
        ol = jax.lax.dynamic_update_slice(ol, sl, (j * chunk,))
        return oh, ol

    zh = jnp.zeros((npad,), jnp.float32)
    oh, ol = jax.lax.fori_loop(0, nch, body, (zh, zh))
    return oh[:n], ol[:n]


class DfAOp:
    """Double-float view of the bucketed operator [A; c'] with the
    apply/adj/adj_y contract of opA.DenseAOp, f64 in / f64 out.

    Built host-side from the f64 sparse data (build_df_aop); registered as
    a pytree so it passes through jit as traced arguments like the other
    operator classes.
    """

    def __init__(self, Al, Aq, As, q_shapes, s_shapes):
        self.Al = Al            # (hi, lo) pairs
        self.Aq = tuple(Aq)
        self.As = tuple(As)
        self.q_shapes = tuple(tuple(s) for s in q_shapes)
        self.s_shapes = tuple(tuple(s) for s in s_shapes)

    def tree_flatten(self):
        return ((self.Al, self.Aq, self.As), (self.q_shapes, self.s_shapes))

    @classmethod
    def tree_unflatten(cls, aux, children):
        Al, Aq, As = children
        return cls(Al, Aq, As, aux[0], aux[1])

    @property
    def m(self) -> int:
        return self.Al[0].shape[0] - 1

    def _flat_parts(self, x: ConeVec):
        parts = []
        if self.Al[0].shape[1]:
            parts.append((self.Al, x.l))
        for aq, xq in zip(self.Aq, x.q):
            parts.append((aq, xq.reshape(-1)))
        for as_, xs in zip(self.As, x.s):
            parts.append((as_, xs.reshape(-1)))
        return parts

    def apply(self, x: ConeVec) -> jax.Array:
        """[A x; c'x] in f64 via df products."""
        mp1 = self.m + 1
        hi = jnp.zeros((mp1,), jnp.float32)
        lo = jnp.zeros((mp1,), jnp.float32)
        for (Ah, Al_), xv in self._flat_parts(x):
            xh, xl = df_split64(xv)
            ph, pl = df_matvec(Ah, Al_, xh, xl)
            s, e = two_sum(hi, ph)
            hi, lo = s, lo + pl + e
        return df_to64(hi, lo)

    def adj(self, w: jax.Array) -> ConeVec:
        """A'w + c*w[m] in f64."""
        wh, wl = df_split64(w)

        def vm(pair):
            ph, pl = df_vecmat(wh, wl, pair[0], pair[1])
            return df_to64(ph, pl)

        l = (vm(self.Al) if self.Al[0].shape[1]
             else jnp.zeros((0,), jnp.float64))
        q = tuple(vm(aq).reshape(c, d)
                  for aq, (c, d) in zip(self.Aq, self.q_shapes))
        s = tuple(vm(as_).reshape(c, d, d)
                  for as_, (c, d) in zip(self.As, self.s_shapes))
        return ConeVec(l=l, q=q, s=s)

    def adj_y(self, y: jax.Array, minus_tau: jax.Array) -> ConeVec:
        """A'y - c*tau (the dual-residual combination)."""
        w = jnp.concatenate([y, jnp.reshape(minus_tau, (1,))])
        return self.adj(w)


jax.tree_util.register_pytree_node_class(DfAOp)


def build_df_aop(At, c, layout, device=None) -> DfAOp:
    """Construct the df operator from f64 host data via the dense bucketed
    layout (opA.build_dense_aop ordering), splitting each bucket into
    (hi, lo) f32 pairs host-side."""
    from .opA import build_dense_aop

    a64 = build_dense_aop(At, c, layout, dtype=np.float64, device="numpy")

    def split_put(a):
        hi = np.asarray(a, np.float32)
        lo = np.asarray(a - hi, np.float32)
        if device is not None:
            return (jax.device_put(hi, device), jax.device_put(lo, device))
        return (jnp.asarray(hi), jnp.asarray(lo))

    Al = split_put(a64.Al)
    Aq = [split_put(a) for a in a64.Aq]
    As = [split_put(a) for a in a64.As]
    return DfAOp(Al, Aq, As, a64.q_shapes, a64.s_shapes)
