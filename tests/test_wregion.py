"""Wide-region proximity tests: the vectorized water-filling iswnbr must
match a direct transcription of the reference's sequential algorithm
(iswnbr.c:97-210), and widelen must keep iterates inside the region."""

import numpy as np
import jax.numpy as jnp

from sedumi_tpu.wregion import iswnbr, prod_spectrum, widelen_batched
from sedumi_tpu.structs import ConeVec


def ref_getdelta(w, theta_sqr):
    """Sequential reference algorithm (iswnbr.c), direct port for testing."""
    w = np.asarray(w, float)
    n = len(w)
    gap = w.sum()
    r = n / theta_sqr
    if 1.0 - theta_sqr <= 1e-8:
        hsqr = w.max()
        h = np.sqrt(hsqr)
        sumdifw = (hsqr - w).sum()
        sumdifv = (h - np.sqrt(w)).sum()
    else:
        ws = np.sort(w)
        sumw = gap
        card = 0
        sumdifv = sumdifw = 0.0
        hsqr = sumw / r
        for wj in ws:
            if wj < hsqr:
                if wj <= 0:
                    return 1e100, 0.0, 0.0
                card += 1
                sumw -= wj
                old = hsqr
                hsqr = sumw / (r - card)
                sumdifw += (old - wj) + card * (hsqr - old)
                sumdifv += (np.sqrt(old) - np.sqrt(wj)) + card * (
                    np.sqrt(hsqr) - np.sqrt(old)
                )
            else:
                break
        h = np.sqrt(hsqr)
    alpha = sumdifv / (r * h)
    dsqr = alpha * (2 - alpha) - (1 - alpha) ** 2 * sumdifw / gap
    return np.sqrt(max(r * dsqr, 0.0)), h, alpha


def test_iswnbr_matches_reference(rng):
    for theta in (0.25, 0.5, 0.9, 1.0):
        for _ in range(5):
            w = rng.uniform(0.01, 3.0, size=37)
            d_ref, h_ref, a_ref = ref_getdelta(w, theta**2)
            d, h, a = iswnbr(jnp.asarray(w), theta)
            np.testing.assert_allclose(float(d), d_ref, rtol=1e-9, atol=1e-12)
            np.testing.assert_allclose(float(h), h_ref, rtol=1e-9)
            np.testing.assert_allclose(float(a), a_ref, rtol=1e-9, atol=1e-12)


def test_iswnbr_central_point():
    # w = mu * ones is perfectly centered: delta = 0
    w = jnp.full(12, 3.7)
    d, h, a = iswnbr(w, 0.25)
    assert float(d) < 1e-8
    assert abs(float(a)) < 1e-10


def test_prod_spectrum_lp_psd(rng):
    # LP: x*z; PSD: eigenvalues of X^(1/2) Z X^(1/2)
    xl = jnp.asarray(rng.uniform(0.5, 2.0, 3))
    zl = jnp.asarray(rng.uniform(0.5, 2.0, 3))
    M = rng.normal(size=(1, 4, 4))
    X = jnp.asarray(M @ M.transpose(0, 2, 1) + 0.5 * np.eye(4))
    M2 = rng.normal(size=(1, 4, 4))
    Z = jnp.asarray(M2 @ M2.transpose(0, 2, 1) + 0.5 * np.eye(4))
    x = ConeVec(l=xl, q=(), s=(X,))
    z = ConeVec(l=zl, q=(), s=(Z,))
    w = np.asarray(prod_spectrum(x, z))
    np.testing.assert_allclose(w[:3], np.asarray(xl * zl), rtol=1e-12)
    Xs = np.asarray(X[0])
    lam, Q = np.linalg.eigh(Xs)
    Xh = Q @ np.diag(np.sqrt(lam)) @ Q.T
    ref = np.linalg.eigvalsh(Xh @ np.asarray(Z[0]) @ Xh)
    np.testing.assert_allclose(np.sort(w[3:]), np.sort(ref), rtol=1e-9)


def test_widelen_batched_accepts_feasible(rng):
    # from a centered point with a small direction, the full trial step
    # must be accepted
    lam = ConeVec(l=jnp.full(4, 1.0), q=(), s=())
    dxs = ConeVec(l=jnp.asarray(rng.normal(size=4) * 0.01), q=(), s=())
    dzs = ConeVec(l=jnp.asarray(rng.normal(size=4) * 0.01), q=(), s=())
    t, deltas = widelen_batched(
        lam, dxs, dzs, jnp.asarray(1.0), jnp.asarray(-0.01), jnp.asarray(1.0),
        jnp.asarray(-0.01), jnp.asarray(0.9), 0.25, 0.5
    )
    assert float(t) == 0.9
