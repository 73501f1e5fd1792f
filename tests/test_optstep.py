"""LP finite-termination projection tests (optstep.m analog).

The projection must turn a nearly-converged LP iterate into the *exact*
optimal vertex solution (residuals at rounding level), and must refuse to
act when the basis guess is wrong.
"""

import numpy as np
import scipy.sparse as sp

from sedumi_tpu import sedumi
from sedumi_tpu.optstep import optstep_lp


def _random_lp(m, n, seed):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n))
    x0 = np.abs(rng.normal(size=n)) + 0.1
    b = A @ x0
    y0 = rng.normal(size=m)
    z0 = np.abs(rng.normal(size=n)) + 0.1
    c = A.T @ y0 + z0           # strictly dual feasible
    return A, b, c


def test_lp_solve_hits_exact_optimum():
    A, b, c = _random_lp(8, 20, 0)
    x, y, info = sedumi(sp.csc_matrix(A.T), b, c, {"l": 20}, {"fid": 0})
    assert info["pinf"] == 0 and info["dinf"] == 0
    # with the optstep projection the residuals should be at rounding level
    assert np.linalg.norm(A @ np.real(x) - b, np.inf) < 1e-9
    z = c - A.T @ np.real(y)
    gap = float(c @ np.real(x) - b @ np.real(y))
    assert abs(gap) < 1e-8 * (1 + abs(c @ np.real(x)))
    assert z.min() > -1e-9


def test_optstep_direct_on_perturbed_optimum():
    from scipy.optimize import linprog

    A, b, c = _random_lp(6, 15, 3)
    res = linprog(c, A_eq=A, b_eq=b, bounds=[(0, None)] * 15, method="highs")
    assert res.status == 0
    x_star = res.x
    y_star = res.eqlin.marginals * -1.0  # highs sign convention
    z_star = c - A.T @ y_star
    if z_star.min() < -1e-9:
        y_star = -y_star
        z_star = c - A.T @ y_star
    # perturb towards the interior, as a late IPM iterate would look
    x_it = x_star + 1e-7
    z_it = np.maximum(z_star, 0) + 1e-7
    xe, ye = optstep_lp(sp.csc_matrix(A.T), b, c, x_it, y_star, z_it)
    assert xe is not None
    np.testing.assert_allclose(A @ xe, b, atol=1e-9)
    assert xe.min() >= 0
    assert abs(c @ xe - res.fun) < 1e-7 * (1 + abs(res.fun))


def test_optstep_rejects_bad_basis():
    A, b, c = _random_lp(6, 15, 4)
    rng = np.random.default_rng(5)
    # garbage iterate: basis guess will fail verification
    x_bad = np.abs(rng.normal(size=15))
    z_bad = np.abs(rng.normal(size=15))
    y_bad = rng.normal(size=6)
    xe, ye = optstep_lp(sp.csc_matrix(A.T), b, c, x_bad, y_bad, z_bad)
    # either refuses, or (rarely) the random guess happens to verify — then
    # the result must be exactly feasible and sign-correct
    if xe is not None:
        np.testing.assert_allclose(A @ xe, b, atol=1e-7)
        assert xe.min() >= 0
