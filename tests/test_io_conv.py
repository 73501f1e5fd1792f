"""Conversion-layer tests: MPS loader (prelp analog), SDPPack converters
(frompack/writesdp analogs), and PSD superblock packing.

Reference test strategy analog: the reference ships no unit tests for its
converters; we gate them on round-trips and on end-to-end solves against
scipy.optimize.linprog.
"""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from sedumi_tpu import sedumi
from sedumi_tpu.cones import ConeSpec, pack_plan
from sedumi_tpu.generators import feasible_problem
from sedumi_tpu.io_mps import prelp, read_mps, read_mps_as_sedumi
from sedumi_tpu.io_pack import from_sdppack, to_sdppack, smat_rows, svec_rows


MPS_SAMPLE = """* sample LP (afiro-style structure)
NAME          TESTLP
ROWS
 N  COST
 L  LIM1
 G  LIM2
 E  MYEQN
COLUMNS
    X1        COST         1.0   LIM1         1.0
    X1        LIM2         1.0
    X2        COST         2.0   LIM1         1.0
    X2        MYEQN       -1.0
    X3        COST        -1.0   LIM2         1.0
    X3        MYEQN        1.0
RHS
    RHS       LIM1         4.0   LIM2         1.0
    RHS       MYEQN        7.0
BOUNDS
 UP BND       X1           4.0
 LO BND       X2          -1.0
ENDATA
"""


@pytest.fixture
def mps_file(tmp_path):
    p = tmp_path / "test.mps"
    p.write_text(MPS_SAMPLE)
    return str(p)


def test_read_mps_shapes(mps_file):
    p = read_mps(mps_file)
    assert p.name == "TESTLP"
    assert p.ncols == 3
    assert p.row_types == ["L", "G", "E"]
    assert p.rhs.tolist() == [4.0, 1.0, 7.0]
    assert p.ub[0] == 4.0 and p.lb[1] == -1.0


def test_prelp_standard_form_matches_linprog(mps_file):
    from scipy.optimize import linprog

    A, b, c, lenx, lbounds, objconst = prelp(mps_file)
    assert lenx == 3
    res = linprog(c, A_eq=A.todense(), b_eq=b, bounds=[(0, None)] * A.shape[1],
                  method="highs")
    assert res.status == 0
    # same LP solved on the original formulation
    res0 = linprog(
        [1.0, 2.0, -1.0],
        A_ub=[[1.0, 1.0, 0.0], [-1.0, 0.0, -1.0]],
        b_ub=[4.0, -1.0],
        A_eq=[[0.0, -1.0, 1.0]],
        b_eq=[7.0],
        bounds=[(0, 4), (-1, None), (0, None)],
        method="highs",
    )
    assert res0.status == 0
    assert np.isclose(res.fun + objconst, res0.fun, rtol=1e-9)


def test_mps_solve_with_sedumi(mps_file):
    from scipy.optimize import linprog

    At, b, c, K, objconst = read_mps_as_sedumi(mps_file)
    x, y, info = sedumi(At, b, c, K, {"fid": 0})
    assert info["pinf"] == 0 and info["dinf"] == 0
    res0 = linprog(
        [1.0, 2.0, -1.0],
        A_ub=[[1.0, 1.0, 0.0], [-1.0, 0.0, -1.0]],
        b_ub=[4.0, -1.0],
        A_eq=[[0.0, -1.0, 1.0]],
        b_eq=[7.0],
        bounds=[(0, 4), (-1, None), (0, None)],
        method="highs",
    )
    cx = float(c @ np.real(x)) + objconst
    assert np.isclose(cx, res0.fun, rtol=1e-6, atol=1e-6)


def test_svec_smat_roundtrip(rng):
    dims = [3, 5, 2]
    nfull = sum(d * d for d in dims)
    # random symmetric rows
    rows = []
    for _ in range(4):
        parts = []
        for d in dims:
            M = rng.normal(size=(d, d))
            M = 0.5 * (M + M.T)
            parts.append(M.ravel(order="F"))
        rows.append(np.concatenate(parts))
    F = sp.csc_matrix(np.stack(rows))
    S = svec_rows(F, dims)
    F2 = smat_rows(S, dims)
    np.testing.assert_allclose(F2.todense(), F.todense(), atol=1e-12)
    # inner products preserved: <svec(X),svec(Y)> = <X,Y>
    g_full = (F @ F.T).todense()
    g_svec = (S @ S.T).todense()
    np.testing.assert_allclose(g_svec, g_full, atol=1e-10)


def test_sdppack_roundtrip_and_solve(rng):
    K = {"l": 3, "q": [3], "s": [3]}
    At, b, c, K2 = feasible_problem(K, m=5, seed=7)
    A_p, b_p, C_p, blk = to_sdppack(At, b, c, K2)
    At2, b2, c2, K3 = from_sdppack(A_p, b_p, C_p, blk)
    np.testing.assert_allclose(np.asarray(At2.todense()),
                               np.asarray(sp.csc_matrix(At).todense()), atol=1e-12)
    np.testing.assert_allclose(c2, np.asarray(c).ravel(), atol=1e-12)
    x, y, info = sedumi(At2, b2, c2, K3, {"fid": 0})
    assert info["pinf"] == 0 and info["dinf"] == 0


def test_write_sdppack_smoke(tmp_path):
    At, b, c, K = feasible_problem({"l": 2, "s": [2]}, m=3, seed=1)
    fname = str(tmp_path / "prob.sdpa")
    from sedumi_tpu.io_pack import write_sdppack

    write_sdppack(fname, At, b, c, K)
    txt = open(fname).read().splitlines()
    assert txt[0].strip() == "3"
    assert os.path.getsize(fname) > 0


def test_pack_plan_exact_and_capacity():
    dims = [6, 6, 6, 6, 15, 15, 36, 15, 15, 36, 72, 36, 36, 20, 90, 90, 20,
            306, 306, 90, 90, 94]
    groups = pack_plan(dims, 128)
    # every block appears exactly once
    flat = sorted(i for g in groups for i in g)
    assert flat == list(range(len(dims)))
    for g in groups:
        tot = sum(dims[i] for i in g)
        assert tot <= 128 or len(g) == 1
    # big blocks stay alone
    for g in groups:
        if any(dims[i] >= 128 for i in g):
            assert len(g) == 1


def test_packed_solve_matches_unpacked(rng):
    # many small PSD blocks: packing must not change the optimum
    K = {"l": 2, "s": [2, 3, 2, 4, 3, 2]}
    At, b, c, K2 = feasible_problem(K, m=6, seed=3)
    x1, y1, i1 = sedumi(At, b, c, K2, {"fid": 0, "pack_dim": 8})
    x2, y2, i2 = sedumi(At, b, c, K2, {"fid": 0, "pack_dim": 0})
    cx1 = float(np.real(np.vdot(c, x1)))
    cx2 = float(np.real(np.vdot(c, x2)))
    assert i1["pinf"] == 0 and i1["dinf"] == 0
    assert np.isclose(cx1, cx2, rtol=1e-6, atol=1e-8)
    # packed primal solution is feasible in the original cones
    from sedumi_tpu.userapi import eigK

    assert float(np.min(eigK(np.real(x1), K2))) > -1e-7
