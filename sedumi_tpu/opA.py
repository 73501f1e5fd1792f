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


@jax.tree_util.register_pytree_node_class
class CooAOp:
    """Sparsity-aware bucketed operator for [A; c'].

    Reference analog: the sparse-At economics of getada3.c / spscale.c —
    the reference never densifies At and forms the Schur complement at
    cost O(nnz * d^2) per PSD block pair instead of O(m * d^3 + m^2 * d^2)
    (getada3.c:1-10, spscale.c:73).  The round-1 dense bucketed operator
    paid the full dense cost: on trto3 (At 398977x544 with only 5681
    nonzeros) the B B' Schur product alone is 2.4e14 flops/iteration; the
    sparse formation below is ~6e9.

    Representation: the LP and Lorentz parts stay dense (their Schur
    contributions are plain GEMMs; problems routed here have small
    (m+1)*(l+sum q)).  Each PSD bucket is either

    * 'dense'  -- flat [m+1, k*d*d] matrix, exactly DenseAOp's layout
                  (chosen when constraint rows are dense relative to d), or
    * 'coo'    -- COO triplets grouped two ways:
        per-(row, block) padded arrays g_row/g_blk/gp/gq/gv for the
          scaled-operator build  B~[i,blk] = W_blk A_i^blk W_blk  as
          batched [pad2, d] x [pad2, d] outer-product GEMMs, and
        flat sorted triplets b_row/b_loc/b_val for apply/adjoint segment
          ops and for the final gather  M[i,j] = sum_t v_t B~[j][loc_t].

    The host flop model in build_coo_aop picks the representation per
    bucket (the sparse/dense crossover policy of getsymbada.m:43-58).
    """

    def __init__(self, Al, Aq, s_parts, q_shapes, s_meta):
        self.Al = Al
        self.Aq = tuple(Aq)
        self.s_parts = tuple(s_parts)      # per-bucket dict of arrays
        self.q_shapes = tuple(tuple(s) for s in q_shapes)
        self.s_meta = tuple(s_meta)        # per-bucket (rep, k, d, G, pad2, T)

    def tree_flatten(self):
        children = (self.Al, self.Aq,
                    tuple(tuple(p[k] for k in sorted(p)) for p in self.s_parts))
        keysets = tuple(tuple(sorted(p)) for p in self.s_parts)
        return children, (self.q_shapes, self.s_meta, keysets)

    @classmethod
    def tree_unflatten(cls, aux, children):
        Al, Aq, s_children = children
        q_shapes, s_meta, keysets = aux
        s_parts = [dict(zip(ks, vals)) for ks, vals in zip(keysets, s_children)]
        return cls(Al, Aq, s_parts, q_shapes, s_meta)

    @property
    def m(self) -> int:
        return self.Al.shape[0] - 1

    def apply(self, x: ConeVec) -> jax.Array:
        """[A x ; c'x] — shape [m+1]."""
        mp1 = self.m + 1
        out = self.Al @ x.l if self.Al.shape[1] else jnp.zeros(mp1, x.l.dtype)
        for aq, xq in zip(self.Aq, x.q):
            out = out + aq @ xq.reshape(-1)
        for part, (rep, k, d, G, pad2, T), xs in zip(
                self.s_parts, self.s_meta, x.s):
            if rep == "dense":
                out = out + part["mat"] @ xs.reshape(-1)
            else:
                contrib = part["b_val"] * xs.reshape(-1)[part["b_loc"]]
                out = out + jax.ops.segment_sum(
                    contrib, part["b_row"], num_segments=mp1,
                    indices_are_sorted=True)
        return out

    def adj(self, w: jax.Array) -> ConeVec:
        """Adjoint of the augmented operator: w=[y; t] -> A'y + c*t."""
        l = self.Al.T @ w
        q = tuple((w @ aq).reshape(c, d)
                  for aq, (c, d) in zip(self.Aq, self.q_shapes))
        s = []
        for part, (rep, k, d, G, pad2, T) in zip(self.s_parts, self.s_meta):
            if rep == "dense":
                s.append((w @ part["mat"]).reshape(k, d, d))
            else:
                vw = part["b_val"] * w[part["b_row"]]
                flat = jax.ops.segment_sum(vw, part["b_loc"],
                                           num_segments=k * d * d)
                s.append(flat.reshape(k, d, d))
        return ConeVec(l=l, q=tuple(q), s=tuple(s))

    def adj_y(self, y: jax.Array, minus_tau: jax.Array) -> ConeVec:
        w = jnp.concatenate([y, jnp.reshape(minus_tau, (1,))])
        return self.adj(w)


def build_coo_aop(
    At: sp.spmatrix, c: np.ndarray, layout: Layout, dtype=np.float64,
    device=None, gemm_discount: float = 3.0,
) -> CooAOp:
    """Host: build the sparsity-aware operator from sparse internal data.

    Per PSD bucket, chooses 'coo' when the sparse Schur formation beats the
    dense congruence + B B' GEMM path on a flop model (discounted by
    `gemm_discount` because MXU GEMMs run closer to peak than gathers).
    """
    _place = (lambda a: jax.device_put(a, device)) if device is not None \
        else jnp.asarray
    N, m = At.shape
    assert N == layout.N, (N, layout.N)
    mp1 = m + 1
    aug = sp.hstack(
        [sp.csc_matrix(At), sp.csc_matrix(np.asarray(c, dtype).reshape(-1, 1))]
    ).T.tocsr()          # [m+1, N]: rows = constraints, last row = c

    nl = layout.l
    nq = int(sum(layout.q))
    # LP + Lorentz parts: dense, identical to DenseAOp
    Al = np.asarray(aug[:, :nl].todense(), dtype) if nl else np.zeros((mp1, 0), dtype)
    Aq, q_shapes = [], []
    q_offs = layout.q_offsets()
    for b in layout.q_buckets:
        cols = np.concatenate([q_offs[i] + np.arange(b.dim) for i in b.block_ids]) \
            if b.count else np.zeros(0, np.int64)
        Aq.append(_place(np.asarray(aug[:, cols].todense(), dtype)))
        q_shapes.append((b.count, b.dim))

    s_offs = layout.s_offsets()
    s_parts, s_meta = [], []
    for b in layout.s_buckets:
        k, d = b.count, b.dim
        cols = np.concatenate([s_offs[i] + np.arange(d * d) for i in b.block_ids]) \
            if k else np.zeros(0, np.int64)
        sub = aug[:, cols].tocoo()  # cols now in bucket-local flat order
        # symmetrize per block: X -> (X + X')/2 in the d x d coordinates
        loc = sub.col.astype(np.int64)
        blk = loc // (d * d)
        p = (loc % (d * d)) // d
        qq = loc % d
        rows2 = np.concatenate([sub.row, sub.row])
        blk2 = np.concatenate([blk, blk])
        p2 = np.concatenate([p, qq])
        q2 = np.concatenate([qq, p])
        v2 = np.concatenate([sub.data, sub.data]) * 0.5
        M2 = sp.coo_matrix((v2, (rows2, blk2 * d * d + p2 * d + q2)),
                           shape=(mp1, k * d * d)).tocsr()
        M2.sum_duplicates()
        sub = M2.tocoo()
        b_row = sub.row.astype(np.int32)
        b_loc = sub.col.astype(np.int32)
        b_val = sub.data.astype(dtype)
        T = b_row.size

        # group by (row, block): padded arrays for the scaled-operator build
        blk_of = b_loc // (d * d)
        keys = b_row.astype(np.int64) * max(k, 1) + blk_of
        order = np.argsort(keys, kind="stable")
        kr, kb = b_row[order], blk_of[order]
        uk, start = np.unique(keys[order], return_index=True)
        counts = np.diff(np.concatenate([start, [T]]))
        G = uk.size
        pad2 = int(counts.max()) if G else 1
        # flop model (per iteration): sparse = outer-product GEMMs + gather;
        # dense = chunked congruence + B B' GEMM (schur._psd_contrib)
        sparse_cost = G * pad2 * d * d * 2 + T * mp1
        dense_cost = mp1 * 4 * k * d**3 + mp1 * mp1 * k * d * d
        rep = "coo" if sparse_cost * gemm_discount < dense_cost else "dense"
        if rep == "dense" or T == 0:
            mat = np.zeros((mp1, k * d * d), dtype)
            mat[b_row, b_loc] = b_val
            s_parts.append({"mat": _place(mat)})
            s_meta.append(("dense", k, d, 0, 0, int(T)))
            continue
        g_row = kr[start].astype(np.int32)
        g_blk = kb[start].astype(np.int32)
        gp = np.zeros((G, pad2), np.int32)
        gq = np.zeros((G, pad2), np.int32)
        gv = np.zeros((G, pad2), dtype)
        pos_in_group = np.arange(T) - np.repeat(start, counts)
        gidx = np.repeat(np.arange(G), counts)
        loc_o = b_loc[order]
        gp[gidx, pos_in_group] = ((loc_o % (d * d)) // d).astype(np.int32)
        gq[gidx, pos_in_group] = (loc_o % d).astype(np.int32)
        gv[gidx, pos_in_group] = b_val[order]
        s_parts.append({
            "b_row": _place(b_row), "b_loc": _place(b_loc),
            "b_val": _place(b_val),
            "g_row": _place(g_row), "g_blk": _place(g_blk),
            "gp": _place(gp), "gq": _place(gq), "gv": _place(gv),
        })
        s_meta.append(("coo", k, d, int(G), int(pad2), int(T)))

    return CooAOp(Al=_place(Al), Aq=Aq, s_parts=s_parts,
                  q_shapes=q_shapes, s_meta=s_meta)


def build_dense_aop(
    At: sp.spmatrix, c: np.ndarray, layout: Layout, dtype=np.float64,
    device=None,
) -> DenseAOp:
    """Host: build the dense bucketed [A; c'] from sparse internal data.

    At is the internal N x m sparse matrix (columns = constraints, SeDuMi
    transpose convention), c the internal N-vector.  One O(nnz) scatter per
    bucket (the marshalling role of partitA.c/extractA.c).

    `device`: optional jax device the arrays are committed to (None = the
    default backend; the string "numpy" keeps host ndarrays — used by the
    double-float splitter, df.build_df_aop).  The heterogeneous-precision
    driver places the f64 operator on the host CPU backend (solver.py).
    """
    if device == "numpy":
        _place = lambda a: a  # noqa: E731
    elif device is not None:
        _place = lambda a: jax.device_put(a, device)  # noqa: E731
    else:
        _place = jnp.asarray
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
