"""Golden tests for the batched Jordan-algebra kernels (SURVEY.md M0:
per-kernel semantics vs. formulas, the unit-test layer the reference lacks)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sedumi_tpu import jordan as jd


def random_soc_interior(rng, n, d, margin=0.5):
    bar = rng.normal(size=(n, d - 1))
    head = np.linalg.norm(bar, axis=-1) + rng.uniform(margin, 2.0, n)
    return jnp.asarray(np.concatenate([head[:, None], bar], axis=1))


class TestLorentz:
    def test_eig_reconstruction(self, rng):
        x = random_soc_interior(rng, 5, 4)
        lam = jd.q_eig(x)
        # trace = lam1+lam2 = 2 x0 ; det = lam1*lam2 = x'Jx
        np.testing.assert_allclose(np.sum(lam, -1), 2 * x[:, 0], rtol=1e-12)
        np.testing.assert_allclose(np.prod(lam, -1), jd.q_tdet(x), rtol=1e-12)

    def test_jmul_identity(self, rng):
        x = random_soc_interior(rng, 3, 5)
        e = jnp.zeros((3, 5)).at[:, 0].set(1.0)
        np.testing.assert_allclose(jd.q_jmul(x, e), x, rtol=1e-12)

    def test_inv_jmul(self, rng):
        x = random_soc_interior(rng, 4, 6)
        r = jnp.asarray(rng.normal(size=(4, 6)))
        u = jd.q_inv_jmul(x, r)
        np.testing.assert_allclose(jd.q_jmul(x, u), r, rtol=1e-10, atol=1e-12)

    def test_inv(self, rng):
        x = random_soc_interior(rng, 4, 3)
        e = jnp.zeros((4, 3)).at[:, 0].set(1.0)
        np.testing.assert_allclose(jd.q_jmul(x, jd.q_inv(x)), e, rtol=1e-10, atol=1e-12)

    def test_sqrt(self, rng):
        x = random_soc_interior(rng, 6, 4)
        s = jd.q_sqrt(x)
        np.testing.assert_allclose(jd.q_jmul(s, s), x, rtol=1e-10, atol=1e-12)

    def test_quad_rep(self, rng):
        # P(u)z against the dense matrix 2uu' - (u'Ju)J
        u = random_soc_interior(rng, 2, 4)
        z = jnp.asarray(rng.normal(size=(2, 4)))
        J = np.diag([1.0, -1, -1, -1])
        for i in range(2):
            ui = np.asarray(u[i])
            P = 2 * np.outer(ui, ui) - (ui @ J @ ui) * J
            np.testing.assert_allclose(jd.q_quad_rep_apply(u, z)[i], P @ np.asarray(z[i]),
                                       rtol=1e-12)

    def test_maxstep(self, rng):
        x = random_soc_interior(rng, 8, 5)
        dx = jnp.asarray(rng.normal(size=(8, 5)))
        t = jd.q_maxstep(x, dx)
        t = np.asarray(t)
        for i in range(8):
            if np.isfinite(t[i]):
                xe = np.asarray(x[i] + t[i] * dx[i])
                lam_min = xe[0] - np.linalg.norm(xe[1:])
                assert abs(lam_min) < 1e-8 * max(1, abs(xe[0]))
            # slightly inside must be feasible
            ti = min(t[i], 1e6) * 0.999
            xi = np.asarray(x[i] + ti * dx[i])
            assert xi[0] - np.linalg.norm(xi[1:]) >= -1e-9


class TestPSD:
    def test_jmul_inv_diag(self, rng):
        lam = jnp.asarray(rng.uniform(0.5, 2.0, (3, 4)))
        r = rng.normal(size=(3, 4, 4))
        r = jnp.asarray(0.5 * (r + r.transpose(0, 2, 1)))
        u = jd.s_inv_jmul_diag(lam, r)
        L = jnp.zeros((3, 4, 4)).at[:, jnp.arange(4), jnp.arange(4)].set(lam)
        np.testing.assert_allclose(jd.s_jmul(L, u), r, rtol=1e-12)

    def test_congr(self, rng):
        a = jnp.asarray(rng.normal(size=(2, 5, 5)))
        x = rng.normal(size=(2, 5, 5))
        x = jnp.asarray(0.5 * (x + x.transpose(0, 2, 1)))
        got = jd.s_congr(a, x)
        for i in range(2):
            np.testing.assert_allclose(
                got[i], np.asarray(a[i]).T @ np.asarray(x[i]) @ np.asarray(a[i]),
                rtol=1e-12)

    def test_maxstep_scaled(self, rng):
        lam = jnp.asarray(rng.uniform(0.5, 2.0, (4, 6)))
        d = rng.normal(size=(4, 6, 6))
        d = jnp.asarray(0.5 * (d + d.transpose(0, 2, 1)))
        t = np.asarray(jd.s_maxstep_scaled(lam, d))
        for i in range(4):
            Lam = np.diag(np.asarray(lam[i]))
            ti = min(t[i], 1e6)
            w = np.linalg.eigvalsh(Lam + 0.999 * ti * np.asarray(d[i]))
            assert w.min() >= -1e-8
            if np.isfinite(t[i]):
                w = np.linalg.eigvalsh(Lam + 1.01 * t[i] * np.asarray(d[i]))
                assert w.min() <= 1e-10


class TestLP:
    def test_maxstep(self, rng):
        x = jnp.asarray(rng.uniform(0.5, 2.0, 10))
        dx = jnp.asarray(rng.normal(size=10))
        t = float(jd.l_maxstep(x, dx))
        assert np.all(np.asarray(x) + 0.999 * min(t, 1e6) * np.asarray(dx) >= -1e-12)
