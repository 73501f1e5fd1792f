"""End-to-end IPM tests on small problems with independently known answers."""

import numpy as np
import scipy.sparse as sp
import pytest

from sedumi_tpu.cones import Layout
from sedumi_tpu.params import Pars
from sedumi_tpu.solver import solve_internal, sedumi


def test_lp_vs_scipy(rng):
    # min c'x, Ax=b, x>=0 with strictly feasible start
    m, n = 4, 9
    A = rng.normal(size=(m, n))
    x0 = rng.uniform(0.5, 2.0, n)
    b = A @ x0
    c = rng.normal(size=n)
    from scipy.optimize import linprog
    ref = linprog(c, A_eq=A, b_eq=b, bounds=[(0, None)] * n, method="highs")
    assert ref.status == 0
    res = solve_internal(sp.csc_matrix(A.T), b, c, Layout(l=n, q=(), s=()),
                         Pars(fid=0))
    assert res.stop == 1
    cx = res.cx / res.tau
    assert abs(cx - ref.fun) <= 1e-6 * (1 + abs(ref.fun))


def test_socp_converges(rng):
    layout = Layout(l=2, q=(3, 4), s=())
    N, m = layout.N, 5
    A = rng.normal(size=(m, N))
    x0 = np.zeros(N)
    x0[:2] = 1.0
    x0[2:5] = [2.0, 0.3, -0.4]
    x0[5:9] = [1.5, 0.2, 0.1, -0.3]
    b = A @ x0
    z0 = x0.copy()
    y0 = rng.normal(size=m)
    c = A.T @ y0 + z0
    res = solve_internal(sp.csc_matrix(A.T), b, c, layout, Pars(fid=0))
    assert res.stop == 1
    assert max(res.err_p, res.err_d, res.gap_rel) <= 1e-8


def test_sdp_vs_known(rng):
    # min <C,X> s.t. tr(X)=1, X psd  =>  optimum = lambda_min(C)
    d = 6
    C = rng.normal(size=(d, d))
    C = 0.5 * (C + C.T)
    A = np.eye(d).reshape(1, -1)
    b = np.array([1.0])
    res = solve_internal(sp.csc_matrix(A.T), b, C.reshape(-1),
                         Layout(l=0, q=(), s=(d,)), Pars(fid=0))
    assert res.stop == 1
    lam_min = np.linalg.eigvalsh(C).min()
    assert abs(res.cx / res.tau - lam_min) <= 1e-7 * (1 + abs(lam_min))


def test_mixed_cone(rng):
    layout = Layout(l=2, q=(3,), s=(4,))
    N, m = layout.N, 6
    A = rng.normal(size=(m, N))
    # strictly interior primal/dual pair
    x0 = np.zeros(N)
    x0[:2] = [1.0, 2.0]
    x0[2:5] = [2.0, 0.5, -0.3]
    M = rng.normal(size=(4, 4))
    x0[5:] = (M @ M.T + 0.5 * np.eye(4)).reshape(-1)
    z0 = np.zeros(N)
    z0[:2] = [1.5, 0.7]
    z0[2:5] = [1.2, -0.2, 0.4]
    M2 = rng.normal(size=(4, 4))
    z0[5:] = (M2 @ M2.T + 0.5 * np.eye(4)).reshape(-1)
    # symmetrize A's psd part
    blk = A[:, 5:].reshape(m, 4, 4)
    A[:, 5:] = (0.5 * (blk + blk.transpose(0, 2, 1))).reshape(m, -1)
    b = A @ x0
    y0 = rng.normal(size=m)
    c = A.T @ y0 + z0
    res = solve_internal(sp.csc_matrix(A.T), b, c, layout, Pars(fid=0))
    assert res.stop == 1
    # primal and dual objectives agree
    assert abs(res.cx - res.by) / res.tau <= 1e-6 * (1 + abs(res.cx / res.tau))


def test_infeasible_lp(rng):
    # x1 = -1, x >= 0: primal infeasible
    A = np.array([[1.0, 0.0]])
    b = np.array([-1.0])
    c = np.array([1.0, 1.0])
    x, y, info = sedumi(A, b, c, {"l": 2}, {"fid": 0})
    assert info["pinf"] == 1


def test_unbounded_lp(rng):
    # min -x1, x1 - x2 = 0, x>=0: unbounded below (dual infeasible)
    A = np.array([[1.0, -1.0]])
    b = np.array([0.0])
    c = np.array([-1.0, 0.0])
    x, y, info = sedumi(A, b, c, {"l": 2}, {"fid": 0})
    assert info["dinf"] == 1


def test_square_A_orientation():
    # Regression: for square A both (m,n) and (n,m) interpretations fit;
    # the documented A (m x n) convention must win (found by /verify: the
    # transposed reading silently solved the wrong problem).
    A = np.array([[1.0, 2.0], [3.0, 4.0]])
    b = np.array([1.0, 2.0])
    for free in (1, 0):
        x, _, info = sedumi(A, b, np.zeros(2), {"f": 2},
                            {"fid": 0, "free": free, "prep": 0})
        assert np.linalg.norm(A @ x - b) < 1e-8
        assert info["numerr"] == 0


def test_rotated_cone():
    # min x3 s.t. x1+x2=2, x3=1, 2 x1 x2 >= x3^2
    A = np.array([[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    x, _, info = sedumi(A, np.array([2.0, 1.0]), np.array([0.0, 0.0, 1.0]),
                        {"r": [3]}, {"fid": 0})
    assert info["numerr"] == 0
    assert 2 * x[0] * x[1] - x[2] ** 2 >= -1e-9
    assert np.linalg.norm(A @ x - np.array([2.0, 1.0])) < 1e-8


def test_checkpoint_resume(rng, tmp_path):
    # interrupt a solve via maxiter, resume from checkpoint, finish
    m, n = 4, 9
    A = rng.normal(size=(m, n))
    x0 = rng.uniform(0.5, 2.0, n)
    b = A @ x0
    c = rng.normal(size=n)
    ckpt = str(tmp_path / "state.npz")
    base = {"fid": 0, "checkpoint_path": ckpt, "checkpoint_every": 1}
    x1, _, info1 = sedumi(A, b, c, {"l": n}, {**base, "maxiter": 4})
    assert info1["iter"] == 4
    x2, _, info2 = sedumi(A, b, c, {"l": n}, {**base, "resume": 1})
    assert info2["numerr"] == 0
    x3, _, info3 = sedumi(A, b, c, {"l": n}, {"fid": 0})
    # resumed solve reaches the same optimum in fewer additional iterations
    assert np.linalg.norm(np.asarray(x2) - np.asarray(x3)) < 1e-5 * (1 + np.linalg.norm(x3))
