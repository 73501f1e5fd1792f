"""Native complex-Hermitian path (VERDICT r3 item 6).

K.scomplex blocks are real-embedded in the data layer (transform._rho),
but the NT scaling factorizes them NATIVELY COMPLEX at order d (half the
sequential rotation rounds of the 2d embedding) and re-embeds R/Rinv/
spectrum.  These tests pin:
  * the complex Jacobi eigensolver against LAPACK,
  * rho-embedding algebra of the scaling output (R' Z R diagonal, lam
    doubled),
  * end-to-end equivalence: the Hermitian example solves identically with
    the native path (herm flags on) and the pure embedded path (flags
    suppressed).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sedumi_tpu import nt
from sedumi_tpu.cones import Layout
from sedumi_tpu.lax_eigh import jacobi_eigh_herm
from sedumi_tpu.linalg_ops import impl_override
from sedumi_tpu.structs import ConeVec


def _rand_herm_pd(rng, k, d, dtype=np.complex128):
    M = rng.normal(size=(k, d, d)) + 1j * rng.normal(size=(k, d, d))
    H = M @ M.conj().transpose(0, 2, 1) + d * np.eye(d)
    return H.astype(dtype)


def _rho(M):
    re, im = np.real(M), np.imag(M)
    return np.block([[re, -im], [im, re]]) if M.ndim == 2 else np.stack(
        [np.block([[re[i], -im[i]], [im[i], re[i]]]) for i in range(M.shape[0])])


def test_jacobi_eigh_herm_matches_lapack(rng):
    for d in (4, 33, 80):
        A = _rand_herm_pd(rng, 3, d) - (d + 1) * np.eye(d)
        with impl_override("jacobi"):
            w, V = jacobi_eigh_herm(jnp.asarray(A))
        wr = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.sort(np.asarray(w), -1), wr,
                                   rtol=1e-11, atol=1e-10 * np.max(np.abs(wr)))
        rec = np.einsum("bik,bk,bjk->bij", np.asarray(V), np.asarray(w),
                        np.conj(np.asarray(V)))
        np.testing.assert_allclose(rec, A, atol=1e-10 * np.max(np.abs(A)))


def test_native_scaling_matches_embedded(rng):
    d, k = 12, 2
    Xc = _rand_herm_pd(rng, k, d)
    Zc = _rand_herm_pd(rng, k, d)
    Xe = jnp.asarray(_rho(Xc))
    Ze = jnp.asarray(_rho(Zc))
    x = ConeVec(l=jnp.zeros(0), q=(), s=(Xe,))
    z = ConeVec(l=jnp.zeros(0), q=(), s=(Ze,))
    S_emb = nt.compute_scaling(x, z, herm=(False,))
    S_nat = nt.compute_scaling(x, z, herm=(True,))
    # R' Z R must be diag(lam) for BOTH paths; the scaled variables agree
    for S in (S_emb, S_nat):
        rzr = np.einsum("kba,kbc,kcd->kad", np.asarray(S.s_r[0]),
                        np.asarray(Ze), np.asarray(S.s_r[0]))
        lam = np.asarray(S.s_lam[0])
        np.testing.assert_allclose(
            rzr, np.stack([np.diag(l) for l in lam]),
            atol=1e-9 * np.max(lam))
    # spectra agree (native path doubles each complex eigenvalue)
    np.testing.assert_allclose(
        np.sort(np.asarray(S_nat.s_lam[0]), -1),
        np.sort(np.asarray(S_emb.s_lam[0]), -1), rtol=1e-9)
    # H-apply agrees between the paths on a random embedded direction
    U = _rho(_rand_herm_pd(rng, k, d) - (d + 1) * np.eye(d))
    u = ConeVec(l=jnp.zeros(0), q=(), s=(jnp.asarray(U),))
    h1 = np.asarray(nt.H_apply(S_emb, u).s[0])
    h2 = np.asarray(nt.H_apply(S_nat, u).s[0])
    np.testing.assert_allclose(h1, h2, atol=1e-8 * np.max(np.abs(h1)))


def test_layout_herm_buckets():
    lay = Layout(l=2, q=(3,), s=(8, 10, 8), s_herm=(False, True, False))
    herm = {b.dim: b.herm for b in lay.s_buckets}
    assert herm == {8: False, 10: True}
    # same dim, mixed flags -> separate buckets
    lay2 = Layout(l=0, q=(), s=(8, 8), s_herm=(False, True))
    assert len(lay2.s_buckets) == 2
    assert sorted(b.herm for b in lay2.s_buckets) == [False, True]


def test_quantum_solves_with_native_path(rng):
    # the bundled complex-Hermitian example: the transform must flag its
    # blocks and the solve must still hit the reference optimum
    from sedumi_tpu.examples import load_example
    from sedumi_tpu.params import Pars
    from sedumi_tpu.transform import pretransfo
    from sedumi_tpu.solver import sedumi

    ex = load_example("quantum")
    prob = pretransfo(ex.At, ex.b, ex.c, ex.K, Pars(fid=0))
    assert any(prob.layout.s_herm), "quantum blocks must be herm-flagged"
    x, y, info = sedumi(ex.At, ex.b, ex.c, ex.K, {"fid": 0, "errors": 0})
    obj = float(np.real(np.vdot(ex.c, x)))
    assert abs(obj - ex.optval) <= 1e-6 * abs(ex.optval)
    assert info["numerr"] < 2
