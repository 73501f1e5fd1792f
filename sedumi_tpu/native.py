"""ctypes bindings for the native host engine (native/host_engine.cc).

The native library provides the sparse-symbolic analysis used by the
factorization planner: AMD ordering (ordmmd.c role), elimination tree /
postorder / column counts / symbolic Cholesky pattern (symfct.c role),
supernode partition with panel splitting (cholsplit.c role), and the
elimination-tree level schedule (new TPU scope — batching plan).

Pure-numpy fallbacks keep the package functional when the .so has not
been built (`make -C native`); `HAVE_NATIVE` reports which path is live.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np
import scipy.sparse as sp

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_libsedumi_host.so")


def _try_load():
    if not os.path.exists(_LIB_PATH):
        # attempt an in-tree build (g++ is a baked-in dependency)
        src = os.path.join(os.path.dirname(__file__), "..", "native",
                           "host_engine.cc")
        if os.path.exists(src):
            import subprocess

            try:
                subprocess.run(
                    ["g++", "-O2", "-fPIC", "-std=c++17", "-shared",
                     "-o", _LIB_PATH, src],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.sed_etree.argtypes = [ctypes.c_int32, i64p, i32p, i32p]
    lib.sed_postorder.argtypes = [ctypes.c_int32, i32p, i32p]
    lib.sed_colcounts.argtypes = [ctypes.c_int32, i64p, i32p, i32p, i32p]
    lib.sed_supernodes.argtypes = [ctypes.c_int32, i32p, i32p,
                                   ctypes.c_int32, i32p, i32p]
    lib.sed_levels.argtypes = [ctypes.c_int32, i32p, i32p, i32p]
    lib.sed_symbolic.argtypes = [ctypes.c_int32, i64p, i32p, i32p, i64p, i32p]
    lib.sed_symbolic.restype = ctypes.c_int64
    lib.sed_amd.argtypes = [ctypes.c_int32, i64p, i32p, i32p]
    return lib


_LIB = _try_load()
HAVE_NATIVE = _LIB is not None


def _csc_pattern(A) -> tuple[np.ndarray, np.ndarray, int]:
    """(colptr int64, rowind int32, n) of the symmetrized pattern."""
    A = sp.csc_matrix(A)
    n = A.shape[0]
    assert A.shape[0] == A.shape[1]
    S = (A + A.T).tocsc()
    return S.indptr.astype(np.int64), S.indices.astype(np.int32), n


def _i32(a):
    return np.ascontiguousarray(a, np.int32)


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def amd_order(A) -> np.ndarray:
    """Fill-reducing permutation (new->old).  AMD via the native engine;
    falls back to reverse-Cuthill-McKee (scipy) when the .so is absent."""
    colptr, rowind, n = _csc_pattern(A)
    if n == 0:
        return np.zeros(0, np.int64)
    if _LIB is not None:
        perm = np.zeros(n, np.int32)
        _LIB.sed_amd(n, _ptr(colptr, ctypes.c_int64),
                     _ptr(rowind, ctypes.c_int32),
                     _ptr(perm, ctypes.c_int32))
        return perm.astype(np.int64)
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    S = sp.csc_matrix((np.ones(rowind.size), rowind,
                       colptr.astype(np.int32)), shape=(n, n))
    return reverse_cuthill_mckee(S, symmetric_mode=True).astype(np.int64)


def etree(A) -> np.ndarray:
    """Elimination tree parents (-1 for roots) of the pattern of A."""
    colptr, rowind, n = _csc_pattern(A)
    parent = np.full(n, -1, np.int32)
    if n == 0:
        return parent.astype(np.int64)
    if _LIB is not None:
        _LIB.sed_etree(n, _ptr(colptr, ctypes.c_int64),
                       _ptr(rowind, ctypes.c_int32),
                       _ptr(parent, ctypes.c_int32))
        return parent.astype(np.int64)
    # numpy fallback (Liu's algorithm)
    ancestor = np.full(n, -1, np.int64)
    parent = np.full(n, -1, np.int64)
    for j in range(n):
        for p in range(colptr[j], colptr[j + 1]):
            i = int(rowind[p])
            if i >= j:
                continue
            while ancestor[i] != -1 and ancestor[i] != j:
                nxt = ancestor[i]
                ancestor[i] = j
                if parent[i] == -1:
                    parent[i] = nxt
                i = int(nxt)
            if ancestor[i] == -1:
                ancestor[i] = j
                if parent[i] == -1 and i != j:
                    parent[i] = j
    return parent


def postorder(parent: np.ndarray) -> np.ndarray:
    n = parent.size
    if n == 0:
        return np.zeros(0, np.int64)
    if _LIB is not None:
        par = _i32(parent)
        post = np.zeros(n, np.int32)
        _LIB.sed_postorder(n, _ptr(par, ctypes.c_int32),
                           _ptr(post, ctypes.c_int32))
        return post.astype(np.int64)
    # fallback: iterative DFS
    children: list[list[int]] = [[] for _ in range(n)]
    for j in range(n - 1, -1, -1):
        p = int(parent[j])
        if p >= 0:
            children[p].append(j)
    post = []
    for root in range(n):
        if parent[root] != -1:
            continue
        stack = [root]
        while stack:
            j = stack[-1]
            if children[j]:
                stack.append(children[j].pop())
            else:
                stack.pop()
                post.append(j)
    return np.asarray(post, np.int64)


def col_counts(A, parent: np.ndarray) -> np.ndarray:
    """Column counts of L (incl. diagonal)."""
    colptr, rowind, n = _csc_pattern(A)
    if n == 0:
        return np.zeros(0, np.int64)
    if _LIB is not None:
        par = _i32(parent)
        counts = np.zeros(n, np.int32)
        _LIB.sed_colcounts(n, _ptr(colptr, ctypes.c_int64),
                           _ptr(rowind, ctypes.c_int32),
                           _ptr(par, ctypes.c_int32),
                           _ptr(counts, ctypes.c_int32))
        return counts.astype(np.int64)
    counts = np.ones(n, np.int64)
    mark = np.full(n, -1, np.int64)
    for i in range(n):
        mark[i] = i
        for p in range(colptr[i], colptr[i + 1]):
            j = int(rowind[p])
            if j > i:
                continue
            t = j
            while t != -1 and mark[t] != i:
                counts[t] += 1
                mark[t] = i
                t = int(parent[t])
    return counts


def supernodes(parent: np.ndarray, counts: np.ndarray,
               maxwidth: int = 0) -> np.ndarray:
    """snode[j] = supernode id of column j (fundamental supernodes split to
    maxwidth columns; 0 = unlimited)."""
    n = parent.size
    if n == 0:
        return np.zeros(0, np.int64)
    if _LIB is not None:
        par, cnt = _i32(parent), _i32(counts)
        snode = np.zeros(n, np.int32)
        ns = np.zeros(1, np.int32)
        _LIB.sed_supernodes(n, _ptr(par, ctypes.c_int32),
                            _ptr(cnt, ctypes.c_int32), maxwidth,
                            _ptr(snode, ctypes.c_int32),
                            _ptr(ns, ctypes.c_int32))
        return snode.astype(np.int64)
    snode = np.zeros(n, np.int64)
    ns = 0
    width = 1
    for j in range(1, n):
        fuse = (parent[j - 1] == j and counts[j] == counts[j - 1] - 1
                and (maxwidth <= 0 or width < maxwidth))
        if fuse:
            snode[j] = ns
            width += 1
        else:
            ns += 1
            snode[j] = ns
            width = 1
    return snode


def levels(parent: np.ndarray) -> np.ndarray:
    """Elimination-tree level of each column (leaves = 0)."""
    n = parent.size
    if n == 0:
        return np.zeros(0, np.int64)
    if _LIB is not None:
        par = _i32(parent)
        lev = np.zeros(n, np.int32)
        nl = np.zeros(1, np.int32)
        _LIB.sed_levels(n, _ptr(par, ctypes.c_int32),
                        _ptr(lev, ctypes.c_int32), _ptr(nl, ctypes.c_int32))
        return lev.astype(np.int64)
    lev = np.zeros(n, np.int64)
    for j in range(n):
        p = int(parent[j])
        if p >= 0:
            lev[p] = max(lev[p], lev[j] + 1)
    return lev


def symbolic_pattern(A, parent: np.ndarray) -> sp.csc_matrix:
    """Boolean lower-triangular pattern of the Cholesky factor of A."""
    colptr, rowind, n = _csc_pattern(A)
    if n == 0:
        return sp.csc_matrix((0, 0))
    if _LIB is not None:
        par = _i32(parent)
        lcolptr = np.zeros(n + 1, np.int64)
        nnz = _LIB.sed_symbolic(n, _ptr(colptr, ctypes.c_int64),
                                _ptr(rowind, ctypes.c_int32),
                                _ptr(par, ctypes.c_int32),
                                _ptr(lcolptr, ctypes.c_int64), None)
        lrowind = np.zeros(int(nnz), np.int32)
        _LIB.sed_symbolic(n, _ptr(colptr, ctypes.c_int64),
                          _ptr(rowind, ctypes.c_int32),
                          _ptr(par, ctypes.c_int32),
                          _ptr(lcolptr, ctypes.c_int64),
                          _ptr(lrowind, ctypes.c_int32))
        return sp.csc_matrix(
            (np.ones(lrowind.size, np.int8), lrowind, lcolptr), shape=(n, n)
        )
    # fallback: column-merge symbolic factorization
    cols: list[set[int]] = []
    for j in range(n):
        s = {int(rowind[p]) for p in range(colptr[j], colptr[j + 1])
             if rowind[p] >= j}
        s.add(j)
        cols.append(s)
    for j in range(n):
        p = int(parent[j])
        if p >= 0:
            cols[p] |= {i for i in cols[j] if i > j}
    indptr = [0]
    indices: list[int] = []
    for j in range(n):
        idx = sorted(cols[j])
        indices.extend(idx)
        indptr.append(len(indices))
    return sp.csc_matrix(
        (np.ones(len(indices), np.int8), np.asarray(indices),
         np.asarray(indptr)), shape=(n, n),
    )
