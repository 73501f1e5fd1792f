"""Schur-panel tensor parallelism: reduce-scattered formation, distributed
block Cholesky, distributed triangular solves.

Reference analog: none executable — the reference accumulates ADA into one
shared-memory global (sedumi.m:220-221, getada.m:11-13) and factors it
sequentially (blkchol2.c:464-563).  SURVEY.md section 2.8 names the
Schur-panel axis as the second meaningful axis of parallelism for this
workload; this module is its TPU realization:

* Formation: ``build_schur`` on the block-sharded operator produces
  per-device partial sums; constraining the output sharding to row panels
  turns XLA's all-reduce into a **reduce-scatter** — each device ends up
  owning a contiguous panel of rows of M and never materializes the whole
  (m x m) matrix (memory m^2/n per device, half the collective volume of
  the replicated all-reduce).
* Factorization: ``dist_cholesky`` — a right-looking blocked Cholesky under
  ``shard_map``: per block-column, the owner's diagonal block is factored,
  the block column is all-gathered (bs x m volume), and every device
  applies the trailing GEMM update to its own rows only.  This is the
  panel-distributed equivalent of the supernodal blkLDL loop.
* Solves: ``dist_fwsolve``/``dist_bwsolve`` — block forward/backward
  substitution where each step solves on the owning device and broadcasts
  the bs-sized result with a masked psum (fwblkslv.c/bwblkslv.c roles).

Factor ownership is BLOCK-CYCLIC (natural block row k lives on device
k mod n, local slot k // n): every elimination step's trailing update is
spread evenly over devices, fixing the ~2x late-stage imbalance of the
round-2 contiguous layout.  The cyclic row (un)permutation is two O(m^2)
gathers around the O(m^3/n) factorization; triangular solves stay on the
natural contiguous layout (they are latency-bound, not flop-bound).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..schur import build_schur


def _pad_up(m: int, mult: int) -> int:
    return -(-m // mult) * mult


def dist_cholesky(Mp: jax.Array, mesh: Mesh, axis: str, bs: int) -> jax.Array:
    """Cholesky of an SPD matrix, factored with BLOCK-CYCLIC row ownership.

    Mp: [mp, mp] with mp divisible by n*bs, natural (elimination) order in
    and out.  Internally rows are permuted so natural block row k lives on
    device k mod n — every trailing update then touches all devices
    equally (the ScaLAPACK layout argument).  Returns lower-triangular L
    with L L' = Mp in natural order; no pivoting — robustness is layered
    on top exactly as in the replicated path (traced regularization +
    refinement, chol.py docstring).
    """
    n = mesh.shape[axis]
    mp = Mp.shape[0]
    nb = mp // bs
    nb_loc = nb // n
    kb = jnp.arange(nb)
    # natural block k <-> cyclic memory slot pos(k) = (k%n)*nb_loc + k//n
    pos_b = (kb % n) * nb_loc + kb // n
    o_b = (kb % nb_loc) * n + kb // nb_loc        # inverse map
    row_in = (o_b[:, None] * bs + jnp.arange(bs)[None, :]).reshape(-1)
    row_out = (pos_b[:, None] * bs + jnp.arange(bs)[None, :]).reshape(-1)

    def local(Ml):
        A = Ml.reshape(nb_loc, bs, mp)
        my = jax.lax.axis_index(axis)
        g = my + n * jnp.arange(nb_loc)      # natural block-row ids (cyclic)
        karr = jnp.arange(nb)

        def body(j, A):
            # block column j across all devices: gathered [n, nb_loc, ...]
            # in device-major order; natural block r*n + d sits at (d, r),
            # so a transpose restores natural order — no gather needed
            colj = jax.lax.dynamic_slice(A, (0, 0, j * bs), (nb_loc, bs, bs))
            C = jnp.swapaxes(jax.lax.all_gather(colj, axis), 0, 1
                             ).reshape(nb, bs, bs)
            Ljj = jnp.linalg.cholesky(C[j])
            Linv = solve_triangular(
                Ljj, jnp.eye(bs, dtype=A.dtype), lower=True)
            Lcol = jnp.einsum("kab,cb->kac", C, Linv)     # C[k] @ Ljj^-T
            Lcol = jnp.where((karr > j)[:, None, None], Lcol, 0.0)
            Lcol = jnp.where((karr == j)[:, None, None], Ljj[None], Lcol)
            # trailing update on the locally-owned rows: A[g] -= Lcol[g] W'
            # with W = stacked Lcol (zero above the diagonal block), so
            # finished columns k < j are untouched; column j is overwritten
            # below.
            W = Lcol.reshape(mp, bs)
            upd = jnp.einsum("rab,kb->rak", Lcol[g], W)
            A = A - jnp.where((g > j)[:, None, None], upd, 0.0)
            newcol = jnp.where((g >= j)[:, None, None], Lcol[g], colj)
            return jax.lax.dynamic_update_slice(A, newcol, (0, 0, j * bs))

        A = jax.lax.fori_loop(0, nb, body, A)
        # zero the strict upper triangle (trailing updates leave garbage
        # there): row block g keeps columns < g fully, the diagonal block
        # keeps its lower triangle.
        A4 = A.reshape(nb_loc, bs, nb, bs)
        kb_ = karr[None, None, :, None]
        gb = g[:, None, None, None]
        r_in = jnp.arange(bs)[None, :, None, None]
        c_in = jnp.arange(bs)[None, None, None, :]
        keep = (kb_ < gb) | ((kb_ == gb) & (c_in <= r_in))
        A4 = jnp.where(keep, A4, 0.0)
        return A4.reshape(nb_loc * bs, mp)

    Lc = jax.shard_map(
        local, mesh=mesh, in_specs=P(axis, None), out_specs=P(axis, None),
    )(Mp[row_in])
    return Lc[row_out]


def _dist_trisolve(L: jax.Array, b: jax.Array, mesh: Mesh, axis: str,
                   bs: int, lower: bool) -> jax.Array:
    """Solve L x = b (lower=True) or L' x = b (lower=False) with L sharded
    in contiguous row panels and b replicated.  Per block step the owning
    device solves a bs x bs triangle and the result is broadcast by masked
    psum; off-owner devices contribute their partial inner products
    (backward case) the same way."""
    n = mesh.shape[axis]
    mp = L.shape[0]
    nb = mp // bs
    nb_loc = nb // n

    def local(Ll, b_):
        L3 = Ll.reshape(nb_loc, bs, mp)
        my = jax.lax.axis_index(axis)
        g = my * nb_loc + jnp.arange(nb_loc)

        if lower:
            def body(j, x):
                owner = j // nb_loc
                r = j - owner * nb_loc
                row = jax.lax.dynamic_slice(
                    L3, (r, 0, 0), (1, bs, mp))[0]          # [bs, mp]
                acc = row @ x          # x is zero at and beyond block j
                Ljj = jax.lax.dynamic_slice(row, (0, j * bs), (bs, bs))
                bj = jax.lax.dynamic_slice(b_, (j * bs,), (bs,))
                xj = solve_triangular(Ljj, bj - acc, lower=True)
                xj = jnp.where(my == owner, xj, 0.0)
                xj = jax.lax.psum(xj, axis)
                return jax.lax.dynamic_update_slice(x, xj, (j * bs,))

            return jax.lax.fori_loop(
                0, nb, body, jnp.zeros(mp, Ll.dtype))

        def body(t, x):
            j = nb - 1 - t
            owner = j // nb_loc
            r = j - owner * nb_loc
            # partial sum over locally-owned rows i > j of L[i,j]' x_i
            colblk = jax.lax.dynamic_slice(
                L3, (0, 0, j * bs), (nb_loc, bs, bs))
            xloc = jax.lax.dynamic_slice(
                x, (my * nb_loc * bs,), (nb_loc * bs,)).reshape(nb_loc, bs)
            contrib = jnp.einsum(
                "rab,ra->b",
                jnp.where((g > j)[:, None, None], colblk, 0.0), xloc)
            Ljj = jnp.where(
                my == owner,
                jax.lax.dynamic_slice(colblk, (r, 0, 0), (1, bs, bs))[0],
                jnp.zeros((bs, bs), Ll.dtype))
            packed = jnp.concatenate([contrib[None, :], Ljj], 0)
            packed = jax.lax.psum(packed, axis)
            contrib, Ljj = packed[0], packed[1:]
            bj = jax.lax.dynamic_slice(b_, (j * bs,), (bs,))
            xj = solve_triangular(Ljj.T, bj - contrib, lower=False)
            return jax.lax.dynamic_update_slice(x, xj, (j * bs,))

        return jax.lax.fori_loop(0, nb, body, jnp.zeros(mp, Ll.dtype))

    return jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis, None), P()), out_specs=P(),
    )(L, b)


class PanelCtx:
    """Factorization context: row-panel-sharded padded ADA + factor."""

    def __init__(self, ADApad, L, dg, m, mp):
        self.ADApad = ADApad
        self.L = L
        self.dg = dg
        self.m = m
        self.mp = mp


class PanelSchurEngine:
    """Linear-system backend with the Schur complement sharded in row
    panels over the mesh (prepare/solve contract of ipm.DenseSchurEngine).

    The Jacobi diagonal scaling mirrors chol_factor's f32 behavior (it is
    what keeps a low-precision factorization useful at IPM dynamic range);
    robustness comes from the same traced regularization + refinement
    ladder as the replicated path.
    """

    def __init__(self, mesh: Mesh, axis: str = "blocks", bs: int | None = None,
                 refine_iters: int = 2, factor_dtype=None):
        self.mesh = mesh
        self.axis = axis
        self.bs = bs                # None: adaptive (128 down to fit m)
        self.n = mesh.shape[axis]
        self.refine_iters = refine_iters
        # factor_dtype HIGHER than the formation dtype: hybrid-phase parity
        # with DenseSchurEngine (f64 factor of the f32-formed matrix);
        # ipm.make_step sets this when building the hybrid step.
        self.factor_dtype = jnp.dtype(factor_dtype) if factor_dtype else None

    def _bs_for(self, m: int) -> int:
        if self.bs is not None:
            return self.bs
        bs = 128                     # MXU-tile-friendly default
        while self.n * bs > max(m, 1) and bs > 4:
            bs //= 2
        return bs

    def prepare(self, aop, S, reg):
        m = aop.m
        bs = self._bs_for(m)
        Maug = build_schur(aop, S)
        ADA = Maug[:m, :m]
        if self.factor_dtype is not None and self.factor_dtype != ADA.dtype:
            ADA = ADA.astype(self.factor_dtype)
            reg = jnp.asarray(reg, self.factor_dtype)
        dt = ADA.dtype
        scale = jnp.mean(jnp.abs(jnp.diag(ADA))) + jnp.finfo(dt).tiny
        mp = _pad_up(m, self.n * bs)
        Mr = ADA + (reg * scale) * jnp.eye(m, dtype=dt)
        dg = jnp.sqrt(jnp.maximum(jnp.diag(Mr), jnp.finfo(dt).tiny))
        Ms = Mr / (dg[:, None] * dg[None, :])
        Mpad = jnp.eye(mp, dtype=dt).at[:m, :m].set(Ms)
        ADApad = jnp.eye(mp, dtype=dt).at[:m, :m].set(ADA)
        spec = NamedSharding(self.mesh, P(self.axis, None))
        # sharding-constraint point: XLA is asked to land the partial block
        # contributions as row panels (reduce-scatter); whether a
        # transient replicated buffer exists is up to the compiler — the
        # guaranteed win is the distributed O(m^3/n) factorization.
        Mpad = jax.lax.with_sharding_constraint(Mpad, spec)
        ADApad = jax.lax.with_sharding_constraint(ADApad, spec)
        L = dist_cholesky(Mpad, self.mesh, self.axis, bs)
        ok = jnp.all(jnp.isfinite(L))
        ctx = PanelCtx(ADApad, L, dg, m, mp)
        ctx.bs = bs
        return ctx, Maug[:m, m], Maug[m, m], ok

    def _base_solve(self, ctx: PanelCtx, rhs_pad):
        y = _dist_trisolve(ctx.L, rhs_pad, self.mesh, self.axis, ctx.bs,
                           lower=True)
        return _dist_trisolve(ctx.L, y, self.mesh, self.axis, ctx.bs,
                              lower=False)

    def solve(self, ctx: PanelCtx, rhs):
        m, mp = ctx.m, ctx.mp
        dgp = jnp.ones(mp, ctx.L.dtype).at[:m].set(ctx.dg)
        b = jnp.zeros(mp, ctx.L.dtype).at[:m].set(rhs.astype(ctx.L.dtype))
        repl = NamedSharding(self.mesh, P())

        def matvec(v):
            # panel GEMM: row-sharded result, gathered back to replicated
            y = ctx.ADApad @ v
            return jax.lax.with_sharding_constraint(y, repl)

        x = self._base_solve(ctx, b / dgp) / dgp
        for _ in range(self.refine_iters):
            r = b - matvec(x)
            x = x + self._base_solve(ctx, r / dgp) / dgp
        return x[:m].astype(rhs.dtype)
