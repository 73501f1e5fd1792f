"""Jacobi eigensolver accuracy vs LAPACK across sizes/batches/spectra."""

import numpy as np
import jax.numpy as jnp
import pytest

from sedumi_tpu.lax_eigh import jacobi_eigh, jacobi_eigvalsh


@pytest.mark.parametrize("n", [2, 3, 5, 8, 17, 40, 101])
def test_matches_lapack(rng, n):
    A = rng.normal(size=(3, n, n))
    A = jnp.asarray(0.5 * (A + A.transpose(0, 2, 1)))
    w, V = jacobi_eigh(A)
    w_ref = np.linalg.eigvalsh(np.asarray(A))
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-11, atol=1e-11)
    # reconstruction + orthogonality
    R = np.einsum("bik,bk,bjk->bij", np.asarray(V), np.asarray(w), np.asarray(V))
    np.testing.assert_allclose(R, np.asarray(A), rtol=0, atol=1e-10 * (1 + np.abs(A).max()))
    VtV = np.einsum("bki,bkj->bij", np.asarray(V), np.asarray(V))
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(n), (3, n, n)), atol=1e-12)


def test_clustered_and_scaled(rng):
    # clustered eigenvalues and wide dynamic range (IPM endgame regime)
    n = 30
    w_true = np.concatenate([
        np.full(10, 1e-9), np.full(10, 1.0), np.geomspace(1e3, 1e9, 10)
    ])
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    A = jnp.asarray((Q * w_true) @ Q.T)[None]
    w = np.asarray(jacobi_eigvalsh(A))[0]
    # backward stability bound: |lam_hat - lam| <= O(eps ||A||); the 1e18
    # dynamic range means small eigenvalues are only absolutely accurate
    # (LAPACK eigh has the same bound)
    tol = 50 * np.finfo(np.float64).eps * np.abs(w_true).max()
    np.testing.assert_allclose(np.sort(w), np.sort(w_true), rtol=1e-8, atol=tol)


def test_odd_padding(rng):
    A = rng.normal(size=(7, 7))
    A = jnp.asarray(0.5 * (A + A.T))
    w, V = jacobi_eigh(A)
    np.testing.assert_allclose(np.asarray(w), np.linalg.eigvalsh(np.asarray(A)),
                               rtol=1e-12, atol=1e-12)


def test_jacobi_eigh_near_singular_nt(rng):
    """Endgame NT matrices have condition ~1/eps; the fixed-sweep Jacobi
    must keep ABSOLUTE eigenvalue error and residual at ~1e-8 * ||A||
    there (its on-device users run in f32, whose floor is 6e-8 * ||A||;
    the true-f64 phase uses LAPACK via linalg_ops.impl_override)."""
    import jax.numpy as jnp
    import numpy as np

    from sedumi_tpu.lax_eigh import jacobi_eigh

    for n, cond in [(96, 1e12), (180, 1e15)]:
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        d = np.geomspace(1.0, 1.0 / cond, n)
        A = (Q * d) @ Q.T
        A = 0.5 * (A + A.T)
        w, V = jacobi_eigh(jnp.asarray(A))
        w_, V_ = np.asarray(w), np.asarray(V)
        wr = np.sort(np.linalg.eigvalsh(A))
        assert np.max(np.abs(np.sort(w_) - wr)) < 1e-7  # ||A|| = 1
        R = A @ V_ - V_ * w_[None, :]
        assert np.linalg.norm(R) / np.linalg.norm(A) < 1e-6
        # no spurious large-negative eigenvalues (would break maxstep)
        assert np.min(w_) > -3e-8


def test_eigh_multi_mixed_dims(rng):
    """One padded Jacobi batch over buckets of different dims must agree
    with per-bucket LAPACK (the TPU NT-scaling hot path)."""
    import jax.numpy as jnp

    from sedumi_tpu import linalg_ops as lo

    mats = []
    for k, d in [(3, 7), (1, 12), (2, 4)]:
        M = rng.standard_normal((k, d, d))
        mats.append(jnp.asarray(0.5 * (M + np.swapaxes(M, -1, -2))))
    with lo.impl_override("jacobi"):
        got = lo.eigh_multi(mats)
        got_w = lo.eigvalsh_multi(mats)
    for (w, V), wv, M in zip(got, got_w, mats):
        Mn = np.asarray(M)
        w_ref = np.linalg.eigvalsh(Mn)
        assert np.allclose(np.sort(np.asarray(w), -1), w_ref, atol=1e-10)
        assert np.allclose(np.sort(np.asarray(wv), -1), w_ref, atol=1e-10)
        # reconstruction with vectors
        R = np.einsum("kij,kj,klj->kil", np.asarray(V), np.asarray(w),
                      np.asarray(V))
        assert np.allclose(R, Mn, atol=1e-9)


def test_compute_scaling_jacobi_matches_lapack(rng):
    """compute_scaling with the batched-multi Jacobi path must agree with
    the LAPACK path on a mixed 2-bucket PSD point."""
    import jax.numpy as jnp

    from sedumi_tpu import linalg_ops as lo
    from sedumi_tpu import nt
    from sedumi_tpu.structs import ConeVec

    def spd(k, d):
        M = rng.standard_normal((k, d, d))
        return jnp.asarray(M @ np.swapaxes(M, -1, -2) + 3.0 * np.eye(d))

    x = ConeVec(l=jnp.asarray(rng.random(5) + 0.5), q=(),
                s=(spd(2, 6), spd(1, 9)))
    z = ConeVec(l=jnp.asarray(rng.random(5) + 0.5), q=(),
                s=(spd(2, 6), spd(1, 9)))
    with lo.impl_override("jacobi"):
        Sj = nt.compute_scaling(x, z)
    with lo.impl_override("xla"):
        Sl = nt.compute_scaling(x, z)
    for rj, rl in zip(Sj.s_r, Sl.s_r):
        # R is unique up to the eig order/signs; compare W = R R'
        Wj = np.einsum("kab,kcb->kac", np.asarray(rj), np.asarray(rj))
        Wl = np.einsum("kab,kcb->kac", np.asarray(rl), np.asarray(rl))
        assert np.allclose(Wj, Wl, rtol=0, atol=1e-8 * np.abs(Wl).max())
    for lj, ll in zip(Sj.s_lam, Sl.s_lam):
        assert np.allclose(np.sort(np.asarray(lj), -1),
                           np.sort(np.asarray(ll), -1), atol=1e-8)
