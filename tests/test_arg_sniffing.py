"""sedumi() argument sniffing (reference: sedumi.m:228-253).

Branches under test:
  * sedumi(A, b, c)           -> all-LP default K.l = max(size(A))
  * sedumi(A, b)              -> LP feasibility (c = 0)
  * sedumi(A, c) [len=n]      -> LP feasibility with the vector read as c
  * sedumi(A, b, K)           -> cone feasibility (c = 0)
  * sedumi(A, b, K, pars)     -> pars shifted from the K position
"""

import numpy as np
import pytest

from sedumi_tpu.solver import sedumi


def _lp_data():
    # min x1 + 2 x2  s.t.  x1 + x2 = 1, x >= 0  -> x = (1, 0), opt 1
    A = np.array([[1.0, 1.0]])
    b = np.array([1.0])
    c = np.array([1.0, 2.0])
    return A, b, c


def test_lp_default_K():
    A, b, c = _lp_data()
    x, y, info = sedumi(A, b, c, pars={"fid": 0})
    assert info["pinf"] == 0 and info["dinf"] == 0 and info["numerr"] < 2
    assert np.allclose(x, [1.0, 0.0], atol=1e-6)
    assert abs(float(c @ x) - 1.0) < 1e-6


def test_lp_default_K_transposed():
    # A passed as its transpose (n x m) still resolves with K.l = max dim
    A, b, c = _lp_data()
    x, y, info = sedumi(A.T, b, c, pars={"fid": 0})
    assert info["pinf"] == 0 and info["dinf"] == 0
    assert np.allclose(x, [1.0, 0.0], atol=1e-6)


def test_feasibility_A_b():
    # sedumi(A, b): find x >= 0 with Ax = b
    A = np.array([[1.0, 1.0, 0.0], [0.0, 1.0, 1.0]])
    b = np.array([1.0, 1.0])
    x, y, info = sedumi(A, b, pars={"fid": 0})
    assert info["pinf"] == 0 and info["dinf"] == 0
    x = np.asarray(x)
    assert np.all(x > -1e-8)
    assert np.allclose(A @ x, b, atol=1e-6)


def test_feasibility_A_c():
    # sedumi(A, c) with len(c) == max(size(A)): the vector is c, b = 0;
    # solves min c'x s.t. Ax = 0, x >= 0 (trivially x = 0)
    A = np.array([[1.0, -1.0, 0.5]])
    c = np.array([1.0, 2.0, 3.0])
    x, y, info = sedumi(A, c, pars={"fid": 0})
    assert info["pinf"] == 0 and info["dinf"] == 0
    assert abs(float(c @ np.asarray(x))) < 1e-6


def test_cone_feasibility_A_b_K():
    # sedumi(A, b, K): K passed in the c position -> c = 0 feasibility
    A = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]])
    b = np.array([2.0, 1.0])
    K = {"q": [3]}
    x, y, info = sedumi(A, b, K)
    assert info["pinf"] == 0 and info["dinf"] == 0
    x = np.asarray(x)
    assert np.allclose(A @ x, b, atol=1e-6)
    assert x[0] >= np.linalg.norm(x[1:]) - 1e-6


def test_cone_feasibility_with_pars_shift():
    # sedumi(A, b, K, pars): the 4th argument is pars when the 3rd is a cone
    A = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]])
    b = np.array([2.0, 1.0])
    x, y, info = sedumi(A, b, {"q": [3]}, {"fid": 0, "eps": 1e-7})
    assert info["pinf"] == 0 and info["dinf"] == 0


def test_missing_b_and_c_rejected():
    A = np.array([[1.0, 1.0]])
    with pytest.raises(Exception):
        sedumi(A, None, None, pars={"fid": 0})
