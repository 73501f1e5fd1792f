"""Native host-engine tests: ordering + symbolic analysis vs brute force.

Validation strategy: every symbolic quantity has an exact dense oracle —
the Cholesky fill pattern of P A P' computable by dense elimination — so
the native results are checked against it on random sparse SPD patterns.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from sedumi_tpu import native


def _random_spd_pattern(n, density, seed):
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=density, random_state=rng, format="csc")
    S = (A + A.T).tocsc()
    S = S + sp.identity(n) * (n + 1.0)
    return S


def _dense_fill(S):
    """Oracle: boolean lower fill pattern by dense symbolic elimination."""
    n = S.shape[0]
    P = (np.abs(S.todense()) > 0).astype(bool)
    P = np.asarray(P)
    L = np.tril(P)
    for k in range(n):
        below = np.where(L[:, k])[0]
        below = below[below > k]
        for i in below:
            L[np.ix_(below[below >= i], [i])] = True
    return L


@pytest.mark.parametrize("n,density,seed", [(30, 0.1, 0), (50, 0.05, 1),
                                            (80, 0.03, 2)])
def test_symbolic_pattern_matches_oracle(n, density, seed):
    S = _random_spd_pattern(n, density, seed)
    parent = native.etree(S)
    Lpat = native.symbolic_pattern(S, parent)
    oracle = _dense_fill(S)
    got = np.asarray(Lpat.todense()).astype(bool)
    np.testing.assert_array_equal(got, oracle)


def test_colcounts_match_pattern():
    S = _random_spd_pattern(60, 0.05, 3)
    parent = native.etree(S)
    counts = native.col_counts(S, parent)
    Lpat = native.symbolic_pattern(S, parent)
    np.testing.assert_array_equal(counts, np.diff(Lpat.indptr))


def test_postorder_valid():
    S = _random_spd_pattern(40, 0.08, 4)
    parent = native.etree(S)
    post = native.postorder(parent)
    assert sorted(post.tolist()) == list(range(40))
    pos = np.empty(40, np.int64)
    pos[post] = np.arange(40)
    for j in range(40):
        if parent[j] >= 0:
            assert pos[j] < pos[parent[j]]  # children before parents


def test_amd_reduces_fill():
    S = _random_spd_pattern(120, 0.04, 5)
    perm = native.amd_order(S)
    assert sorted(perm.tolist()) == list(range(120))
    # fill with AMD should not exceed fill with natural order (typical case;
    # use a generous factor to keep the test robust)
    def fill_nnz(order):
        Sp = S[order][:, order]
        parent = native.etree(Sp)
        return int(native.col_counts(Sp, parent).sum())

    f_amd = fill_nnz(perm)
    f_nat = fill_nnz(np.arange(120))
    assert f_amd <= f_nat * 1.1


def test_amd_on_arrow_matrix():
    # arrow matrix: natural order causes full fill; AMD must avoid it
    n = 50
    rows = list(range(n)) + [0] * (n - 1) + list(range(1, n))
    cols = list(range(n)) + list(range(1, n)) + [0] * (n - 1)
    S = sp.csc_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    perm = native.amd_order(S)
    Sp = S[perm][:, perm]
    parent = native.etree(Sp)
    fill = int(native.col_counts(Sp, parent).sum())
    assert fill <= 3 * n  # near-linear fill; dense would be n(n+1)/2


def test_levels_and_supernodes():
    S = _random_spd_pattern(60, 0.05, 6)
    parent = native.etree(S)
    counts = native.col_counts(S, parent)
    lev = native.levels(parent)
    for j in range(60):
        if parent[j] >= 0:
            assert lev[parent[j]] > lev[j]
    sn = native.supernodes(parent, counts, maxwidth=4)
    # supernode ids are nondecreasing and contiguous
    assert sn[0] == 0
    d = np.diff(sn)
    assert ((d == 0) | (d == 1)).all()
    # width constraint
    _, w = np.unique(sn, return_counts=True)
    assert w.max() <= 4


def test_native_lib_loaded():
    # the build environment ships g++; the .so must be present or built
    assert native.HAVE_NATIVE
