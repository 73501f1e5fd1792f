"""Bucketed cone-vector pytree and flat<->bucket conversion.

An element of the internal cone space K = R+^l x Q^q1..qk x S+^s1..sr is held
on device as a :class:`ConeVec`: one dense vector for the LP part, one dense
[count, dim] batch per Lorentz bucket, and one dense [count, dim, dim] batch
per PSD bucket.  This is the TPU-native replacement for the reference's flat
sparse vector + per-block loops (psdeig.m:59, psdscale.m:76): every Jordan
op becomes a single batched dense kernel per bucket.

ConeVec is a NamedTuple and hence a JAX pytree: jax.tree_util arithmetic,
jit, vmap and sharding all apply directly.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .cones import Layout


class ConeVec(NamedTuple):
    """One element of the cone space in bucketed dense form.

    l: [nl] LP part.
    q: tuple over q-buckets of [count, dim] Lorentz blocks.
    s: tuple over s-buckets of [count, dim, dim] symmetric PSD blocks.
    """

    l: jax.Array
    q: tuple[jax.Array, ...]
    s: tuple[jax.Array, ...]


def cv_zeros(layout: Layout, dtype=jnp.float64) -> ConeVec:
    return ConeVec(
        l=jnp.zeros((layout.l,), dtype),
        q=tuple(jnp.zeros((b.count, b.dim), dtype) for b in layout.q_buckets),
        s=tuple(jnp.zeros((b.count, b.dim, b.dim), dtype) for b in layout.s_buckets),
    )


def cv_eye(layout: Layout, dtype=jnp.float64) -> ConeVec:
    """Identity element of K (reference: eyeK.m): ones on the LP part,
    (1,0,..,0) per Lorentz cone, I per PSD block."""
    q = []
    for b in layout.q_buckets:
        e = jnp.zeros((b.count, b.dim), dtype).at[:, 0].set(1.0)
        q.append(e)
    s = tuple(
        jnp.broadcast_to(jnp.eye(b.dim, dtype=dtype), (b.count, b.dim, b.dim))
        for b in layout.s_buckets
    )
    return ConeVec(l=jnp.ones((layout.l,), dtype), q=tuple(q), s=s)


def cv_dot(a: ConeVec, b: ConeVec) -> jax.Array:
    """<a, b> over the whole cone space.  For PSD blocks the full-matrix
    elementwise sum equals tr(A B) for symmetric blocks."""
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    parts = [jnp.vdot(x, y) for x, y in zip(leaves_a, leaves_b)]
    return sum(parts) if parts else jnp.zeros(())


def cv_add(a: ConeVec, b: ConeVec) -> ConeVec:
    return jax.tree_util.tree_map(jnp.add, a, b)


def cv_sub(a: ConeVec, b: ConeVec) -> ConeVec:
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def cv_scale(a: ConeVec, alpha) -> ConeVec:
    return jax.tree_util.tree_map(lambda x: alpha * x, a)


def cv_axpy(alpha, x: ConeVec, y: ConeVec) -> ConeVec:
    """alpha*x + y."""
    return jax.tree_util.tree_map(lambda xi, yi: alpha * xi + yi, x, y)


def cv_neg(a: ConeVec) -> ConeVec:
    return jax.tree_util.tree_map(jnp.negative, a)


def cv_norm(a: ConeVec) -> jax.Array:
    return jnp.sqrt(cv_dot(a, a))


def cv_sym(a: ConeVec) -> ConeVec:
    """Symmetrize the PSD parts (reference: vecsym.c)."""
    return a._replace(s=tuple(0.5 * (S + jnp.swapaxes(S, -1, -2)) for S in a.s))


def cv_astype(a: ConeVec, dtype) -> ConeVec:
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), a)


# ---------------------------------------------------------------------------
# Host-side flat <-> bucket conversion (numpy; used at setup and output).
# The flat internal layout is [lp | q blocks in order | vec(S blocks)].
# ---------------------------------------------------------------------------


def _q_indices(layout: Layout) -> list[np.ndarray]:
    offs = layout.q_offsets()
    out = []
    for b in layout.q_buckets:
        idx = np.stack([offs[i] + np.arange(b.dim) for i in b.block_ids]) \
            if b.count else np.zeros((0, b.dim), np.int64)
        out.append(idx.astype(np.int64))
    return out


def _s_indices(layout: Layout) -> list[np.ndarray]:
    offs = layout.s_offsets()
    out = []
    for b in layout.s_buckets:
        idx = np.stack(
            [offs[i] + np.arange(b.dim * b.dim).reshape(b.dim, b.dim) for i in b.block_ids]
        ) if b.count else np.zeros((0, b.dim, b.dim), np.int64)
        out.append(idx.astype(np.int64))
    return out


def from_flat(layout: Layout, x: np.ndarray, dtype=np.float64, symmetrize: bool = True) -> ConeVec:
    """Host: split a flat internal vector into bucketed form.

    PSD blocks are symmetrized ((X+X')/2, reference: vecsym.c) unless
    disabled; with symmetric blocks the row/col-major vec convention is
    immaterial.
    """
    x = np.asarray(x, dtype=dtype).ravel()
    ql = [x[idx] for idx in _q_indices(layout)]
    sl = []
    for idx in _s_indices(layout):
        blk = x[idx]
        if symmetrize:
            blk = 0.5 * (blk + np.swapaxes(blk, -1, -2))
        sl.append(blk)
    return ConeVec(
        l=jnp.asarray(x[: layout.l], dtype),
        q=tuple(jnp.asarray(v, dtype) for v in ql),
        s=tuple(jnp.asarray(v, dtype) for v in sl),
    )


def to_flat(layout: Layout, v: ConeVec) -> np.ndarray:
    """Host: assemble the flat internal vector from bucketed form."""
    leaves = [np.asarray(v.l)]
    x = np.zeros(layout.N, dtype=np.asarray(v.l).dtype if layout.l else np.float64)
    x[: layout.l] = np.asarray(v.l)
    for idx, arr in zip(_q_indices(layout), v.q):
        x[idx.ravel()] = np.asarray(arr).ravel()
        x.dtype  # keep linters quiet
    for idx, arr in zip(_s_indices(layout), v.s):
        x[idx.ravel()] = np.asarray(arr).ravel()
    del leaves
    return x
