"""Farkas certificate quality across cone families.

Reference analog: sedumi.m:612-728 — infeasibility is declared only when a
GOOD certificate exists (reldirinf < eps, or the feasible interpretation is
clearly worse), certificates are normalized by their objective value, and
numerr grades the quality.  Round-1 coverage was LP-only (VERDICT item 8);
these add SOCP and SDP infeasible/unbounded cases and check the returned
certificates on the original data."""

import numpy as np
import scipy.sparse as sp

from sedumi_tpu import sedumi
from sedumi_tpu.userapi import eigK


def test_infeasible_lp_certificate():
    # x1 = 1 and x1 = -1 with x >= 0: primal infeasible
    A = np.array([[1.0, 0.0], [-1.0, 0.0]])
    b = np.array([1.0, 1.0])
    c = np.array([1.0, 1.0])
    x, y, info = sedumi(A, b, c, {"l": 2}, {"fid": 0})
    assert info["pinf"] == 1 and info["numerr"] < 2
    # y is a normalized Farkas certificate: b'y = 1, A'y <= 0
    assert abs(b @ y - 1.0) < 1e-6
    assert np.max(A.T @ y) < 1e-6


def test_infeasible_socp_certificate():
    """t >= ||u||, t = -1 is infeasible (Lorentz head forced negative)."""
    # vars: (t, u1, u2) in Q3; constraint t = -1
    A = np.array([[1.0, 0.0, 0.0]])
    b = np.array([-1.0])
    c = np.zeros(3)
    x, y, info = sedumi(A, b, c, {"q": [3]}, {"fid": 0})
    assert info["pinf"] == 1, info
    # certificate: b'y = 1 with c - A'y = -A'y in the dual cone
    assert b @ y > 1.0 - 1e-6
    z = -A.T @ y
    lab = eigK(z.ravel(), {"q": [3]})
    assert np.min(lab) > -1e-6


def test_infeasible_sdp_certificate():
    """X PSD with X_11 = -1: infeasible; dual ray is a PSD matrix."""
    n = 3
    E11 = np.zeros((n, n))
    E11[0, 0] = 1.0
    A = E11.reshape(1, -1)
    b = np.array([-1.0])
    c = np.zeros(n * n)
    x, y, info = sedumi(A, b, c, {"s": [n]}, {"fid": 0})
    assert info["pinf"] == 1, info
    assert b @ y > 1.0 - 1e-6
    Z = (-A.T @ y).reshape(n, n)
    assert np.min(np.linalg.eigvalsh(0.5 * (Z + Z.T))) > -1e-6


def test_unbounded_lp_gives_dual_infeasible():
    """min -x1 s.t. x2 = 1, x >= 0: unbounded below => dinf=1 and the
    returned x is an improving ray (c'x = -1 after normalization)."""
    A = np.array([[0.0, 1.0]])
    b = np.array([1.0])
    c = np.array([-1.0, 0.0])
    x, y, info = sedumi(A, b, c, {"l": 2}, {"fid": 0})
    assert info["dinf"] == 1, info
    assert abs(c @ x + 1.0) < 1e-6          # normalized: c'x = -1
    assert np.linalg.norm(A @ x) < 1e-6     # ray is in the nullspace
    assert np.min(x) > -1e-9


def test_unbounded_socp_ray():
    """Unbounded SOCP: minimize -u1 over Q3 with only the head pinned to a
    budget times tau: min c'x with A x = b keeping a free ray."""
    # vars (t,u1,u2): constraint t - u1 = 0 keeps the recession cone
    # nonempty along (1,1,0); objective -u1 is unbounded on it.
    A = np.array([[1.0, -1.0, 0.0]])
    b = np.array([0.0])
    c = np.array([0.0, -1.0, 0.0])
    x, y, info = sedumi(A, b, c, {"q": [3]}, {"fid": 0})
    assert info["dinf"] == 1, info
    lab = eigK(np.asarray(x).ravel(), {"q": [3]})
    assert np.min(lab) > -1e-7              # ray lies in the cone
    assert c @ x < -(1.0 - 1e-6)            # improving: c'x = -1


def test_feasible_not_flagged_infeasible():
    """A well-posed problem must never trip the Farkas branch."""
    rng = np.random.default_rng(0)
    A = sp.random(8, 20, density=0.4, random_state=0).toarray() + 0.1
    x0 = rng.random(20) + 0.5
    b = A @ x0
    c = A.T @ rng.standard_normal(8) + rng.random(20) + 0.5
    x, y, info = sedumi(A, b, c, {"l": 20}, {"fid": 0})
    assert info["pinf"] == 0 and info["dinf"] == 0 and info["numerr"] == 0


def test_precheck_infeasible_b(rng):
    """Trivially infeasible Ax=b is certified by the pre-IPM least-squares
    probe (sedumi.m:262-282) without running the IPM."""
    import scipy.sparse as sp

    from sedumi_tpu import sedumi

    A = np.array([[1.0, 1.0, 0.5], [2.0, 2.0, 1.0]])   # row2 = 2*row1
    b = np.array([1.0, 3.0])                            # inconsistent
    c = np.ones(3)
    x, y, info = sedumi(A, b, c, {"l": 3}, {"fid": 0})
    assert info["pinf"] == 1
    assert info["iter"] == 0                            # certified pre-IPM


def test_precheck_drops_dependent_rows(rng):
    """An LP with a duplicated (consistent) constraint row solves cleanly:
    the pre-check drops the dependent row (prep note) instead of leaning on
    the regularization ladder (sedumi.m:299-301's TODO, implemented)."""
    from sedumi_tpu import sedumi

    m, n = 12, 30
    A0 = rng.standard_normal((m, n))
    x0 = rng.random(n) + 0.5
    b0 = A0 @ x0
    A = np.vstack([A0, A0[3]])          # duplicate row 3
    b = np.concatenate([b0, b0[3:4]])
    c = A.T @ (rng.standard_normal(m + 1) * 0.1) + rng.random(n) + 0.5
    x, y, info = sedumi(A, b, c, {"l": n}, {"fid": 0, "optstep": 0})
    assert info["pinf"] == 0 and info["dinf"] == 0 and info["numerr"] == 0
    assert max(info["err"]) < 1e-7, info["err"]
    # the duplicated row's multiplier pair is still a valid dual
    z = c - A.T @ y
    assert z.min() > -1e-8
