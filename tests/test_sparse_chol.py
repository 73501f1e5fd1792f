"""Tile-sparse Cholesky tests: factor/solve vs scipy on random sparse SPD
matrices at several sizes and tile widths (the L3 engine's correctness
gate; reference has no unit tests here — we add them per SURVEY.md §4)."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from sedumi_tpu.sparse_chol import SparseCholesky


def _random_spd(n, density, seed):
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=density, random_state=rng, format="csc")
    S = A @ A.T + sp.identity(n) * n * 0.5
    return sp.csc_matrix(S)


@pytest.mark.parametrize("n,density,B,seed", [
    (50, 0.10, 16, 0),
    (130, 0.05, 32, 1),
    (300, 0.02, 64, 2),
])
def test_factor_solve_matches_scipy(n, density, B, seed):
    M = _random_spd(n, density, seed)
    f = SparseCholesky(M, B=B)
    L = f.factor(M)
    rng = np.random.default_rng(seed + 100)
    b = rng.normal(size=n)
    x = f.solve(L, b)
    x_ref = spla.spsolve(M, b)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-10)


def test_refactor_same_plan_different_values():
    # symbchol-once / blkchol-many usage pattern
    M1 = _random_spd(80, 0.06, 3)
    f = SparseCholesky(M1, B=32)
    rng = np.random.default_rng(9)
    d = np.abs(rng.normal(size=80)) + 0.5
    M2 = sp.csc_matrix(M1.multiply(1.0)) + sp.diags(d)
    L2 = f.factor(M2)
    b = rng.normal(size=80)
    np.testing.assert_allclose(f.solve(L2, b), spla.spsolve(M2, b),
                               rtol=1e-8, atol=1e-10)


def test_diag_add_never_fails():
    # singular matrix: the factorization must not produce NaN and the
    # factor must still be usable as a preconditioner (blkchol.c semantics)
    n = 40
    M = _random_spd(n, 0.1, 5)
    M = M - sp.diags(M.diagonal())  # zero diagonal -> massively indefinite
    M = M + sp.diags(np.ones(n) * 1e-18)
    f = SparseCholesky(sp.csc_matrix(np.abs(M) + sp.identity(n)), B=16)
    L = f.factor(sp.csc_matrix(np.abs(M) + sp.identity(n) * 1e-18))
    assert np.isfinite(np.asarray(L)).all()


def test_pcg_with_tile_preconditioner():
    # inexact factor (heavy regularization) + CG = exact solve
    import jax.numpy as jnp

    from sedumi_tpu.pcg import pcg

    n = 120
    M = _random_spd(n, 0.05, 7)
    f = SparseCholesky(M, B=32)
    L = f.factor(M, reg=1e-4)   # deliberately perturbed factor
    rng = np.random.default_rng(11)
    b = rng.normal(size=n)
    Md = jnp.asarray(M.todense())

    res = pcg(lambda v: Md @ v, lambda r: f.solve_device(L, r),
              jnp.asarray(b), jnp.zeros(n), maxiter=60, restol=1e-12)
    x_ref = spla.spsolve(M, b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("n,density,B,seed", [
    (120, 0.06, 16, 4),
    (300, 0.02, 64, 5),
])
def test_level_scheduled_factor_matches_sequential(n, density, B, seed):
    """factor_tiles_lv (etree-level batched) must produce the same factor
    and solves as the sequential factor_tiles."""
    import jax.numpy as jnp

    from sedumi_tpu.sparse_chol import (
        factor_tiles, factor_tiles_lv, plan_tiles, solve_tiles,
        solve_tiles_lv, SparseCholesky,
    )

    M = _random_spd(n, density, seed)
    f = SparseCholesky(M, B=B)
    pl = f.plan
    L_seq = f.factor(M)            # sequential factor_tiles path
    # same storage, level-scheduled
    Mp = sp.csc_matrix(M)[pl.perm][:, pl.perm].tocoo()
    mask = Mp.row >= Mp.col
    ri, ci = Mp.row[mask], Mp.col[mask]
    st = np.asarray([pl.slot_of[(int(r) // B, int(c) // B)]
                     for r, c in zip(ri, ci)], np.int64)
    dst = st * (B * B) + (ri % B).astype(np.int64) * B + (ci % B)
    flat = jnp.zeros(pl.nslot * B * B).at[jnp.asarray(dst)].add(
        jnp.asarray(Mp.data[mask]))
    if pl.n > n:
        pad = np.arange(n, pl.n)
        pst = np.asarray([pl.slot_of[(int(i) // B, int(i) // B)]
                          for i in pad], np.int64)
        flat = flat.at[jnp.asarray(pst * (B * B) + (pad % B) * B + (pad % B))].add(1.0)
    L_lv = factor_tiles_lv(flat.reshape(pl.nslot, B, B), pl.dslot, pl.oslot,
                           pl.omask, pl.pa, pl.pb, pl.pdst, pl.pmask,
                           pl.lv_cols, jnp.asarray(0.0), pl.nlev)
    # compare the real (non-trash) tiles
    np.testing.assert_allclose(np.asarray(L_lv[:-1]), np.asarray(L_seq[:-1]),
                               rtol=1e-10, atol=1e-10)
    rng = np.random.default_rng(seed)
    b = rng.normal(size=pl.n)
    x_seq = solve_tiles(L_seq, jnp.asarray(b), pl.dslot, pl.oslot, pl.omask,
                        pl.orow, pl.ntc)
    x_lv = solve_tiles_lv(L_lv, jnp.asarray(b), pl.dslot, pl.oslot, pl.omask,
                          pl.orow, pl.lv_cols, pl.lv_cmask, pl.nlev)
    np.testing.assert_allclose(np.asarray(x_lv), np.asarray(x_seq),
                               rtol=1e-9, atol=1e-10)
