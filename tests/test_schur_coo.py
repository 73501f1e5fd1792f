"""Sparsity-aware operator + Schur formation vs the dense reference path.

The CooAOp 'coo' PSD representation (opA.build_coo_aop) and its Schur
formation (schur._psd_contrib_coo) must agree with the dense bucketed path
(DenseAOp + schur._psd_contrib) to roundoff — same (m+1)x(m+1) augmented
Schur complement, same apply/adjoint.  Reference semantics: getada3.c +
spscale.c (sparse two-sided PSD scaling)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from sedumi_tpu import nt
from sedumi_tpu.cones import Layout
from sedumi_tpu.generators import feasible_problem
from sedumi_tpu.opA import build_coo_aop, build_dense_aop
from sedumi_tpu.params import Pars
from sedumi_tpu.schur import build_schur
from sedumi_tpu.structs import ConeVec, cv_eye
from sedumi_tpu.transform import pretransfo


def _mixed_problem(rng, sparse=True):
    K = {"l": 3, "q": [4, 3], "s": [5, 5, 7]}
    At, b, c, Kspec = feasible_problem(K, 11, seed=7)
    if sparse:
        # sparsify the PSD part heavily so the coo rep is exercised with
        # realistic (few-nnz-per-constraint) structure
        At = sp.csc_matrix(At)
        At.data[rng.random(At.nnz) < 0.8] = 0.0
        At.eliminate_zeros()
    prob = pretransfo(At, b, c, Kspec, Pars(fid=0))
    return prob


def _scaling(layout, rng):
    # a strictly-interior random (x, z) pair -> well-defined NT scaling
    def interior():
        l = jnp.asarray(rng.random(layout.l) + 0.5)
        q = tuple(
            jnp.asarray(
                np.concatenate(
                    [
                        (rng.random((bk.count, 1)) + 2.0),
                        rng.standard_normal((bk.count, bk.dim - 1)) * 0.3,
                    ],
                    axis=1,
                )
            )
            for bk in layout.q_buckets
        )
        s = []
        for bk in layout.s_buckets:
            a = rng.standard_normal((bk.count, bk.dim, bk.dim))
            s.append(jnp.asarray(a @ a.transpose(0, 2, 1) + 2 * np.eye(bk.dim)))
        return ConeVec(l=l, q=q, s=tuple(s))

    return nt.compute_scaling(interior(), interior())


@pytest.mark.parametrize("force", ["coo", "auto"])
def test_coo_schur_matches_dense(rng, force):
    prob = _mixed_problem(rng)
    layout = prob.layout
    discount = 0.0 if force == "coo" else 3.0
    aop_d = build_dense_aop(prob.At, prob.c, layout)
    aop_c = build_coo_aop(prob.At, prob.c, layout, gemm_discount=discount)
    if force == "coo":
        assert all(meta[0] == "coo" for meta in aop_c.s_meta), aop_c.s_meta

    S = _scaling(layout, rng)
    Md = np.asarray(build_schur(aop_d, S))
    Mc = np.asarray(build_schur(aop_c, S))
    scale = np.abs(Md).max() + 1.0
    assert np.allclose(Mc, Md, atol=1e-9 * scale), np.abs(Mc - Md).max()


def test_coo_apply_adjoint_match_dense(rng):
    prob = _mixed_problem(rng)
    layout = prob.layout
    aop_d = build_dense_aop(prob.At, prob.c, layout)
    aop_c = build_coo_aop(prob.At, prob.c, layout, gemm_discount=0.0)

    x = cv_eye(layout)
    x = ConeVec(
        l=x.l * jnp.asarray(rng.random(layout.l) + 0.5),
        q=tuple(jnp.asarray(rng.standard_normal(a.shape)) for a in x.q),
        s=tuple(
            jnp.asarray(
                (lambda b: b + b.transpose(0, 2, 1))(
                    rng.standard_normal(a.shape)
                )
            )
            for a in x.s
        ),
    )
    np.testing.assert_allclose(
        np.asarray(aop_c.apply(x)), np.asarray(aop_d.apply(x)), atol=1e-10
    )
    w = jnp.asarray(rng.standard_normal(aop_d.m + 1))
    ad = aop_d.adj(w)
    ac = aop_c.adj(w)
    np.testing.assert_allclose(np.asarray(ac.l), np.asarray(ad.l), atol=1e-10)
    for a, b in zip(ac.q, ad.q):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)
    for a, b in zip(ac.s, ad.s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)
