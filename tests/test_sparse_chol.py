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
