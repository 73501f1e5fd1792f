"""Double-float operator product tests (df.py): the compensated two-f32
apply/adj must reproduce the f64 products to ~1e-13 relative — the
accuracy the on-device hybrid endgame's residuals rely on (quadadd.c /
loopPcg.m:100-108 role on hardware without native f64)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def _mixed_problem(seed=0, m=17):
    from sedumi_tpu.generators import feasible_problem
    from sedumi_tpu.params import Pars
    from sedumi_tpu.transform import pretransfo

    K = {"l": 5, "q": [3, 4], "s": [5, 6]}
    At, b, c, Kspec = feasible_problem(K, m, seed=seed)
    prob = pretransfo(At, b, c, Kspec, Pars(fid=0))
    return prob


def test_two_sum_two_prod_exact(rng):
    import jax.numpy as jnp

    from sedumi_tpu.df import two_prod, two_sum

    a = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    b = jnp.asarray(rng.standard_normal(1000) * 1e-3, jnp.float32)
    s, e = two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    assert np.max(np.abs(got - exact)) == 0.0  # error-free transformation

    p, pe = two_prod(a, b)
    exactp = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    gotp = np.asarray(p, np.float64) + np.asarray(pe, np.float64)
    assert np.max(np.abs(gotp - exactp)) == 0.0


def test_df_matvec_accuracy(rng):
    import jax.numpy as jnp

    from sedumi_tpu.df import df_matvec, df_split64, df_to64

    m, n = 37, 5000
    A = rng.standard_normal((m, n)) * np.exp(rng.standard_normal((m, n)))
    x = rng.standard_normal(n)
    Ah, Al = df_split64(A)
    xh, xl = df_split64(x)
    hi, lo = df_matvec(Ah, Al, xh, xl, chunk=1024)
    got = np.asarray(df_to64(hi, lo))
    ref = A @ x
    scale = np.abs(A) @ np.abs(x)
    assert np.max(np.abs(got - ref) / scale) < 1e-12


def test_df_aop_matches_f64(rng):
    """DfAOp.apply/adj vs the f64 DenseAOp on a real transformed problem."""
    import jax.numpy as jnp

    from sedumi_tpu.df import build_df_aop
    from sedumi_tpu.opA import build_dense_aop
    from sedumi_tpu.structs import ConeVec, from_flat

    prob = _mixed_problem()
    lay = prob.layout
    a64 = build_dense_aop(prob.At, prob.c, lay, dtype=np.float64)
    adf = build_df_aop(prob.At, prob.c, lay)

    x = from_flat(lay, rng.standard_normal(lay.N))
    ref = np.asarray(a64.apply(x))
    got = np.asarray(adf.apply(x))
    assert got.dtype == np.float64
    assert np.max(np.abs(got - ref)) < 1e-12 * (1 + np.max(np.abs(ref)))

    w = rng.standard_normal(adf.m + 1)
    ref_a = a64.adj(jnp.asarray(w))
    got_a = adf.adj(jnp.asarray(w))
    for rf, gf in [(ref_a.l, got_a.l)] + list(zip(ref_a.q, got_a.q)) + list(
            zip(ref_a.s, got_a.s)):
        rf, gf = np.asarray(rf), np.asarray(gf)
        assert np.max(np.abs(gf - rf)) < 1e-12 * (1 + np.max(np.abs(rf)))

    y = rng.standard_normal(adf.m)
    tau = 0.37
    ref_y = a64.adj_y(jnp.asarray(y), jnp.asarray(-tau))
    got_y = adf.adj_y(jnp.asarray(y), jnp.asarray(-tau))
    assert np.max(np.abs(np.asarray(got_y.l) - np.asarray(ref_y.l))) < 1e-11


def test_df_beats_f32(rng):
    """The df product must be ~6 orders more accurate than plain f32 on an
    ill-conditioned (cancellation-heavy) product."""
    import jax.numpy as jnp

    from sedumi_tpu.df import df_matvec, df_split64, df_to64

    n = 4096
    A = rng.standard_normal((4, n))
    x = rng.standard_normal(n)
    # engineer cancellation: second half cancels the first
    A[:, n // 2:] = -A[:, : n // 2]
    x[n // 2:] = x[: n // 2] * (1 + 1e-9)
    ref = A.astype(np.float64) @ x.astype(np.float64)
    f32 = np.asarray(jnp.asarray(A, jnp.float32) @ jnp.asarray(x, jnp.float32),
                     np.float64)
    Ah, Al = df_split64(A)
    xh, xl = df_split64(x)
    got = np.asarray(df_to64(*df_matvec(Ah, Al, xh, xl, chunk=512)))
    err_df = np.max(np.abs(got - ref))
    err_f32 = np.max(np.abs(f32 - ref))
    assert err_df < 1e-5 * max(err_f32, 1e-300)
