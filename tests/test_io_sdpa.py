"""SDPA reader/writer round-trip and solve tests."""

import numpy as np
import scipy.sparse as sp

from sedumi_tpu.io_sdpa import read_sdpa, write_sdpa
from sedumi_tpu.generators import feasible_problem
from sedumi_tpu.solver import sedumi


def test_roundtrip(tmp_path, rng):
    At, b, c, K = feasible_problem({"l": 3, "s": [3, 2]}, m=4, seed=7)
    fname = str(tmp_path / "prob.dat-s")
    write_sdpa(fname, At, b, c, K)
    At2, b2, c2, K2 = read_sdpa(fname)
    np.testing.assert_allclose(b2, b, rtol=1e-15)
    assert K2["l"] == 3 and K2["s"] == [3, 2]
    # data equality up to symmetrization (writer emits upper triangle)
    def sym_flat(Amat):
        Amat = sp.csc_matrix(Amat).toarray()
        out = Amat.copy()
        off = 3
        for d in [3, 2]:
            blk = Amat[off : off + d * d, :].reshape(d, d, -1)
            out[off : off + d * d, :] = (
                0.5 * (blk + blk.transpose(1, 0, 2))
            ).reshape(d * d, -1)
            off += d * d
        return out

    np.testing.assert_allclose(sym_flat(At2), sym_flat(At), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        sym_flat(c2.reshape(-1, 1)), sym_flat(np.asarray(c).reshape(-1, 1)),
        rtol=1e-12, atol=1e-14,
    )


def test_read_and_solve(tmp_path, rng):
    # write a problem with a known optimum: min <C,X> s.t. tr X = 1
    d = 4
    C = rng.normal(size=(d, d))
    C = 0.5 * (C + C.T)
    At = sp.csc_matrix(np.eye(d).reshape(-1, 1))
    fname = str(tmp_path / "eig.dat-s")
    write_sdpa(fname, At, np.array([1.0]), C.reshape(-1), {"s": [d]})
    At2, b2, c2, K2 = read_sdpa(fname)
    x, y, info = sedumi(At2, b2, c2, K2, {"fid": 0})
    lam_min = np.linalg.eigvalsh(C).min()
    cx = float(np.vdot(c2, x))
    assert abs(cx - lam_min) < 1e-7 * (1 + abs(lam_min))


def test_comments_and_formats(tmp_path):
    # tolerate comment lines, braces and commas (fromsdpa.m regexprep)
    txt = """* test problem
" another comment
2
2
{2, -1}
(1.0, 2.0)
0 1 1 1 1.0
1 1 1 2 0.5
1 2 1 1 1.0
2 1 2 2 1.0
2 2 1 1 1.0
"""
    fname = str(tmp_path / "c.dat-s")
    open(fname, "w").write(txt)
    At, b, c, K = read_sdpa(fname)
    assert K["l"] == 1 and K["s"] == [2]
    np.testing.assert_allclose(b, [1.0, 2.0])
    # N = 1 (lp) + 4 (sdp)
    assert At.shape == (5, 2)
    # c = -F0: F0 has (1,1)=1 in the sdp block
    assert c[1] == -1.0 and c[0] == 0.0
