"""Double-double linear algebra (ddlinalg) and the dd64 endgame phase.

The dd engine's claim is quantitative: where f64 factorization floors at
cond(M)*eps_f64, the Ozaki split-GEMM pipeline keeps solving.  These
tests pin (a) kernel exactness against long-double references, (b) the
factor/solve residual on a cond=1e14 SPD matrix, and (c) the end-to-end
phase behavior: an eps=1e-11 solve must engage dd64 and beat the pure
f64 floor by orders of magnitude.
"""

import numpy as np
import pytest

from sedumi_tpu import ddlinalg as dd


def test_dd_gemm_beats_f64(rng):
    m, k, n = 80, 120, 70
    A = rng.normal(size=(m, k)) * np.exp(rng.normal(size=(m, k)) * 2)
    B = rng.normal(size=(k, n))
    Ch, Cl = dd.dd_gemm(A, None, B, None)
    ref = np.asarray(A, np.longdouble) @ np.asarray(B, np.longdouble)
    scale = np.max(np.abs(ref))
    err_dd = float(np.max(np.abs((np.asarray(Ch, np.longdouble) + Cl)
                                 - ref))) / scale
    err_f64 = float(np.max(np.abs(np.asarray(A @ B, np.longdouble)
                                  - ref))) / scale
    # dd must sit at the long-double measurement floor, far below f64
    assert err_dd < 1e-17
    assert err_dd < err_f64 / 10


def test_dd_chol_solve_ill_conditioned(rng):
    m = 120
    U = np.linalg.qr(rng.normal(size=(m, m)))[0]
    lam = np.logspace(0, -14, m)               # cond 1e14
    A = (U * lam) @ U.T
    A = 0.5 * (A + A.T)
    f = dd.dd_chol(A)
    assert f.ok
    b = rng.normal(size=m)
    xh, xl = dd.dd_chol_solve(f, b)
    r = np.asarray(b, np.longdouble) \
        - np.asarray(A, np.longdouble) @ (np.asarray(xh, np.longdouble) + xl)
    rel_dd = float(np.linalg.norm(np.asarray(r, np.float64))) \
        / np.linalg.norm(b)
    xf = np.linalg.solve(A, b)
    rel_f64 = np.linalg.norm(b - A @ xf) / np.linalg.norm(b)
    assert rel_dd < 1e-5
    assert rel_dd < rel_f64 / 100


def test_dd_scalar_ops():
    a = np.array([1.0, 1e-17, 3.0])
    b = np.array([1e-17, 1.0, -3.0])
    sh, sl = dd.two_sum(a, b)
    # error-free: hi+lo reproduces the exact sum in long double
    ref = np.asarray(a, np.longdouble) + np.asarray(b, np.longdouble)
    assert np.all(np.asarray(sh, np.longdouble) + sl == ref)
    ph, pl = dd.two_prod(np.array([1.0 + 2**-30]), np.array([1.0 - 2**-30]))
    ref = (np.longdouble(1.0) + np.longdouble(2.0)**-30) * \
        (np.longdouble(1.0) - np.longdouble(2.0)**-30)
    assert abs(float((np.asarray(ph, np.longdouble) + pl) - ref)) < 1e-19
    qh, ql = dd.dd_sqrt(np.asarray(2.0), np.asarray(0.0))
    assert abs(float(qh) - np.sqrt(2.0)) < 1e-15
    # long-double squaring itself rounds at ~5e-20; test at that floor
    assert abs(float((np.asarray(qh, np.longdouble) + ql)**2 - 2.0)) < 1e-18


def test_dd64_phase_breaks_f64_floor():
    """End-to-end: eps=1e-11 forces the ladder past the f64 floor; the
    dd64 phase must deliver r0 <= 1e-10 where pure f64 floors ~1e-8."""
    from sedumi_tpu import sedumi
    from sedumi_tpu.generators import feasible_problem

    At, b, c, Ks = feasible_problem({"l": 4, "s": [6, 5]}, 12, seed=3)
    x, y, info = sedumi(At, b, c, Ks,
                        {"fid": 0, "eps": 1e-11, "refine": 0})
    assert info["r0"] <= 1e-10, info
    assert "dd64" in info.get("phases", {}), info.get("phases")
