"""The constraint operator A in bucketed dense form.

TPU-first design (SURVEY.md section 7, items 2-3): instead of the
reference's sparse At with per-range extraction (partitA.c, extractA.c,
findblks.c), we materialize A — augmented with the objective c as a final
row — as dense per-bucket matrices, stored FLAT:

    Al : [m+1, nl]
    Aq : per q-bucket [m+1, count*d]
    As : per s-bucket [m+1, count*d*d]   (PSD coefficient matrices,
                                          symmetrized; vecsym.c analog)

so that A x and A'w are plain 2-D GEMMs.  Storing the natural [m+1, k, d,
d] tensors instead and contracting with einsum made XLA:TPU stack several
full-size copies of the operand to batch the dot_generals (observed: an
8x949x2x320x320 f32 temp = 6.9 GB on OH-sized data); flat 2-D GEMMs have
no such failure mode.  The Schur congruence reshapes small m-chunks back
to [c, k, d, d] on the fly (schur._psd_contrib).

The augmented row gives A H c and c' H c for free in the same product
(the self-dual embedding needs them each iteration, sedumi.m:442-466).
Row convention: rows 0..m-1 are the constraints, row m is c.  The
augmented adjoint maps w=[y; -tau] to A'y - c*tau, exactly the combination
appearing in the dual residual.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .cones import Layout
from .structs import ConeVec


@jax.tree_util.register_pytree_node_class
class DenseAOp:
    """Dense bucketed operator for [A; c'].

    A registered pytree whose children are the data matrices (always traced
    arguments — closing over large constants triggers XLA constant-folding
    pathologies) and whose aux data are the static bucket shapes.
    """

    def __init__(self, Al, Aq, As, q_shapes, s_shapes):
        self.Al = Al
        self.Aq = tuple(Aq)
        self.As = tuple(As)
        self.q_shapes = tuple(tuple(s) for s in q_shapes)  # (count, d)
        self.s_shapes = tuple(tuple(s) for s in s_shapes)  # (count, d)

    def tree_flatten(self):
        return ((self.Al, self.Aq, self.As), (self.q_shapes, self.s_shapes))

    @classmethod
    def tree_unflatten(cls, aux, children):
        Al, Aq, As = children
        return cls(Al, Aq, As, aux[0], aux[1])

    @property
    def m(self) -> int:
        return self.Al.shape[0] - 1

    def apply(self, x: ConeVec) -> jax.Array:
        """[A x ; c'x] — shape [m+1]."""
        out = self.Al @ x.l if self.Al.shape[1] else jnp.zeros(self.m + 1, x.l.dtype)
        for aq, xq in zip(self.Aq, x.q):
            out = out + aq @ xq.reshape(-1)
        for as_, xs in zip(self.As, x.s):
            out = out + as_ @ xs.reshape(-1)
        return out

    def adj(self, w: jax.Array) -> ConeVec:
        """Adjoint of the augmented operator: w=[y; t] -> A'y + c*t."""
        l = self.Al.T @ w
        q = tuple((w @ aq).reshape(c, d)
                  for aq, (c, d) in zip(self.Aq, self.q_shapes))
        s = tuple((w @ as_).reshape(c, d, d)
                  for as_, (c, d) in zip(self.As, self.s_shapes))
        return ConeVec(l=l, q=q, s=s)

    def adj_y(self, y: jax.Array, minus_tau: jax.Array) -> ConeVec:
        """A'y - c*tau via the augmented adjoint."""
        w = jnp.concatenate([y, jnp.reshape(minus_tau, (1,))])
        return self.adj(w)


def build_dense_aop(
    At: sp.spmatrix, c: np.ndarray, layout: Layout, dtype=np.float64,
    device=None,
) -> DenseAOp:
    """Host: build the dense bucketed [A; c'] from sparse internal data.

    At is the internal N x m sparse matrix (columns = constraints, SeDuMi
    transpose convention), c the internal N-vector.  One O(nnz) scatter per
    bucket (the marshalling role of partitA.c/extractA.c).

    `device`: optional jax device the arrays are committed to (None = the
    default backend).  The heterogeneous-precision driver places the f64
    operator on the host CPU backend (solver.py).
    """
    _place = (lambda a: jax.device_put(a, device)) if device is not None \
        else jnp.asarray
    N, m = At.shape
    assert N == layout.N, (N, layout.N)
    aug = sp.hstack(
        [sp.csc_matrix(At), sp.csc_matrix(np.asarray(c, dtype).reshape(-1, 1))]
    ).tocoo()
    nz_row = aug.row.astype(np.int64)
    nz_col = aug.col.astype(np.int64)
    nz_val = aug.data.astype(dtype)

    row_bucket = np.full(N, -1, np.int64)   # which bucket a flat row lands in
    row_pos = np.zeros(N, np.int64)         # flat position inside the bucket

    Al = np.zeros((m + 1, layout.l), dtype)
    if layout.l:
        row_bucket[: layout.l] = -2  # LP marker
        row_pos[: layout.l] = np.arange(layout.l)

    q_offs = layout.q_offsets()
    for bi, b in enumerate(layout.q_buckets):
        rows = np.concatenate([q_offs[i] + np.arange(b.dim) for i in b.block_ids]) \
            if b.count else np.zeros(0, np.int64)
        row_bucket[rows] = bi
        row_pos[rows] = np.arange(rows.size)

    s_offs = layout.s_offsets()
    nq = len(layout.q_buckets)
    for bi, b in enumerate(layout.s_buckets):
        rows = np.concatenate(
            [s_offs[i] + np.arange(b.dim * b.dim) for i in b.block_ids]
        ) if b.count else np.zeros(0, np.int64)
        row_bucket[rows] = nq + bi
        row_pos[rows] = np.arange(rows.size)

    rb = row_bucket[nz_row]
    rp = row_pos[nz_row]
    if layout.l:
        sel = rb == -2
        Al[nz_col[sel], rp[sel]] = nz_val[sel]

    Aq = []
    q_shapes = []
    for bi, b in enumerate(layout.q_buckets):
        blk = np.zeros((m + 1, b.count * b.dim), dtype)
        sel = rb == bi
        blk[nz_col[sel], rp[sel]] = nz_val[sel]
        Aq.append(_place(blk))
        q_shapes.append((b.count, b.dim))

    As = []
    s_shapes = []
    for bi, b in enumerate(layout.s_buckets):
        blk = np.zeros((m + 1, b.count * b.dim * b.dim), dtype)
        sel = rb == nq + bi
        blk[nz_col[sel], rp[sel]] = nz_val[sel]
        t = blk.reshape(m + 1, b.count, b.dim, b.dim)
        for k in range(b.count):  # symmetrize per block to bound peak memory
            tk = t[:, k]
            t[:, k] = 0.5 * (tk + np.swapaxes(tk, -1, -2))
        As.append(_place(blk))
        s_shapes.append((b.count, b.dim))

    return DenseAOp(Al=_place(Al), Aq=Aq, As=As,
                    q_shapes=q_shapes, s_shapes=s_shapes)
