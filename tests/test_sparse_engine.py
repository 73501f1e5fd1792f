"""Sparse Schur path: tile Cholesky + PCG + dense-column Woodbury, routed.

Covers VERDICT round-1 items 1-2: the sparse engine must be the path the
SOLVER actually takes for large-m sparse LP/SOC problems (info['lin_engine']
proves it), must agree with the dense path, and must keep the ADA pattern
sparse in the presence of dense columns (getdense.m + deninfac.m semantics
via Woodbury + ldl_masked)."""

import numpy as np
import pytest
import scipy.sparse as sp

from sedumi_tpu import sedumi


def _random_sparse_lp(m, n_extra, rng, density=3, dense_cols=0):
    """Feasible sparse LP: n = m + n_extra vars, ~density nnz per column."""
    n = m + n_extra
    rows = []
    cols = []
    vals = []
    # ensure every constraint is touched: a permuted diagonal
    perm = rng.permutation(m)
    rows.append(perm)
    cols.append(np.arange(m))
    vals.append(rng.random(m) + 0.5)
    for j in range(m, n):
        k = rng.integers(1, density + 1)
        r = rng.choice(m, size=k, replace=False)
        rows.append(r)
        cols.append(np.full(k, j))
        vals.append(rng.standard_normal(k))
    for j in range(dense_cols):
        # a genuinely dense column: hits half of all constraints
        r = rng.choice(m, size=m // 2, replace=False)
        rows.append(r)
        cols.append(np.full(r.size, j + m))
        vals.append(rng.standard_normal(r.size) * 0.3)
    A = sp.csc_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(m, n),
    )
    x0 = rng.random(n) + 0.5
    b = A @ x0
    y0 = rng.standard_normal(m) * 0.1
    s0 = rng.random(n) + 0.5
    c = A.T @ y0 + s0          # strictly feasible dual
    return A, b, c, {"l": n}


def test_sparse_lp_routes_and_solves(rng):
    m = 1000
    A, b, c, K = _random_sparse_lp(m, 600, rng)
    x, y, info = sedumi(A, b, c, K, {"fid": 0, "optstep": 0})
    assert info["lin_engine"] == "sparse", info
    assert info["pinf"] == 0 and info["dinf"] == 0
    assert max(info["err"]) < 1e-7, info["err"]
    assert np.linalg.norm(A @ x - b) / (1 + np.abs(b).max()) < 1e-7


def test_sparse_matches_dense_answer(rng):
    m = 900
    A, b, c, K = _random_sparse_lp(m, 300, rng)
    xs, ys, infos = sedumi(A, b, c, K, {"fid": 0, "sparse": 1, "optstep": 0})
    xd, yd, infod = sedumi(A, b, c, K, {"fid": 0, "sparse": 0, "optstep": 0})
    assert infos["lin_engine"] == "sparse"
    assert infod["lin_engine"] == "dense"
    cs = float(c @ xs)
    cd = float(c @ xd)
    assert abs(cs - cd) <= 1e-6 * (1 + abs(cd)), (cs, cd)


def test_dense_columns_keep_pattern_sparse_and_match(rng):
    """k dense columns must go through the Woodbury bundle (pattern stays
    sparse) and the answer must match the forced-dense solve to 1e-8."""
    from sedumi_tpu.cones import Layout
    from sedumi_tpu.params import Pars
    from sedumi_tpu.sparse_engine import plan_sparse_lq

    m = 900
    A, b, c, K = _random_sparse_lp(m, 200, rng, dense_cols=3)
    layout = Layout(l=A.shape[1], q=(), s=())
    _, meta = plan_sparse_lq(sp.csc_matrix(A).T, c, layout, Pars(fid=0))
    assert meta["Kd"] == 3, meta
    assert meta["ada_density"] < 0.2, meta["ada_density"]

    xs, ys, infos = sedumi(A, b, c, K, {"fid": 0, "sparse": 1, "optstep": 0})
    xd, yd, infod = sedumi(A, b, c, K, {"fid": 0, "sparse": 0, "optstep": 0})
    assert infos["lin_engine"] == "sparse"
    cs = float(c @ xs)
    cd = float(c @ xd)
    assert abs(cs - cd) <= 1e-6 * (1 + abs(cd)), (cs, cd)
    assert max(infos["err"]) < 1e-7, infos["err"]


def test_sparse_socp_with_cones(rng):
    """Mixed LP + Lorentz problem through the sparse path (u rank-1 terms)."""
    m = 850
    A, b, c, K = _random_sparse_lp(m, 100, rng)
    n = A.shape[1]
    # append 60 Lorentz cones of dim 3, each touching 3 random constraints
    qdims = [3] * 60
    rows, cols, vals = [], [], []
    off = 0
    for d in qdims:
        r = rng.choice(m, size=3, replace=False)
        for j in range(d):
            rows.append(r)
            cols.append(np.full(r.size, n + off + j))
            vals.append(rng.standard_normal(r.size) * 0.2)
        off += d
    Aq = sp.csc_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(m, n + sum(qdims)),
    )
    Aq[:, :n] = A
    xq = np.zeros(sum(qdims))
    o = 0
    for d in qdims:
        xq[o] = 2.0
        xq[o + 1:o + d] = rng.standard_normal(d - 1) * 0.3
        o += d
    x0 = np.concatenate([rng.random(n) + 0.5, xq])
    bq = Aq @ x0
    zq = np.zeros(sum(qdims))
    o = 0
    for d in qdims:
        zq[o] = 1.5
        zq[o + 1:o + d] = rng.standard_normal(d - 1) * 0.2
        o += d
    cq = Aq.T @ (rng.standard_normal(m) * 0.1) + np.concatenate(
        [rng.random(n) + 0.5, zq])
    Kq = {"l": n, "q": qdims}
    x, y, info = sedumi(Aq, bq, cq, Kq, {"fid": 0, "optstep": 0})
    assert info["lin_engine"] == "sparse", info
    assert max(info["err"]) < 1e-7, info["err"]


@pytest.mark.slow
def test_sparse_lp_20k(rng):
    """VERDICT item-1 'done' gate: m >= 20000 LP solves to 1e-8 through the
    sparse path (dense would need a 3.2 GB Schur matrix + O(m^3) factor)."""
    m = 20000
    A, b, c, K = _random_sparse_lp(m, 4000, rng)
    x, y, info = sedumi(A, b, c, K, {"fid": 1, "optstep": 0})
    assert info["lin_engine"] == "sparse"
    assert max(info["err"]) < 1e-7, info["err"]


def _random_sparse_sdp(m, nb, d, rng, touch=2):
    """Feasible sparse SDP: nb PSD blocks of dim d, each constraint touching
    `touch` blocks with a few symmetric entries — ADA is sparse because each
    block is shared by only ~m*touch/nb constraints (small cliques)."""
    n = nb * d * d
    rows, cols, vals = [], [], []
    for i in range(m):
        blks = rng.choice(nb, size=touch, replace=False)
        for bk in blks:
            # 2 random symmetric entries + a diagonal anchor
            p = int(rng.integers(0, d))
            q = int(rng.integers(0, d))
            v = float(rng.standard_normal())
            base = bk * d * d
            ent = {(p, q): 0.5 * v, (q, p): 0.5 * v} if p != q else {(p, p): v}
            dg = int(rng.integers(0, d))
            ent[(dg, dg)] = ent.get((dg, dg), 0.0) + float(
                rng.standard_normal())
            for (a, bq_), vv in ent.items():
                rows.append(i)
                cols.append(base + a * d + bq_)
                vals.append(vv)
    A = sp.csc_matrix((vals, (rows, cols)), shape=(m, n))
    x0 = np.tile(np.eye(d).ravel(), nb)               # identity blocks
    b = A @ x0
    y0 = rng.standard_normal(m) * 0.1
    z0 = np.tile((np.eye(d) * 1.5).ravel(), nb)
    c = A.T @ y0 + z0                                 # strictly feasible dual
    return A, b, c, {"s": [d] * nb}


def test_sparse_sdp_routes_and_solves(rng):
    """PSD cones through the tile engine (VERDICT round-2 item 3): sparse
    ADA formed from per-pair scaled products (getada3.c role)."""
    m = 1200
    A, b, c, K = _random_sparse_sdp(m, 600, 4, rng)
    x, y, info = sedumi(A, b, c, K, {"fid": 0, "optstep": 0})
    assert info["lin_engine"] == "sparse", info
    assert info["pinf"] == 0 and info["dinf"] == 0
    assert max(info["err"]) < 1e-7, info["err"]
    assert np.linalg.norm(A @ x - b) / (1 + np.abs(b).max()) < 1e-7


def test_sparse_sdp_matches_dense(rng):
    m = 900
    A, b, c, K = _random_sparse_sdp(m, 450, 3, rng)
    xs, ys, infos = sedumi(A, b, c, K, {"fid": 0, "sparse": 1, "optstep": 0})
    xd, yd, infod = sedumi(A, b, c, K, {"fid": 0, "sparse": 0, "optstep": 0})
    assert infos["lin_engine"] == "sparse"
    assert infod["lin_engine"] == "dense"
    cs = float(c @ xs)
    cd = float(c @ xd)
    assert abs(cs - cd) <= 1e-6 * (1 + abs(cd)), (cs, cd)


@pytest.mark.slow
def test_sparse_sdp_5k(rng):
    """VERDICT round-2 item-3 'done' gate: a synthetic sparse SDP with
    m >= 5000 solves to 1e-8 through lin_engine == 'sparse' (the dense path
    would form a 200 MB Schur matrix and pay O(m^3))."""
    m = 5000
    A, b, c, K = _random_sparse_sdp(m, 2500, 4, rng)
    x, y, info = sedumi(A, b, c, K, {"fid": 1, "optstep": 0})
    assert info["lin_engine"] == "sparse", info
    assert max(info["err"]) < 1e-7, info["err"]
