"""NT-scaling property tests: the scaling must map x and z to the same
scaled point lam, preserve inner products, and H must satisfy H z = x
(the defining NT property, updtransfo.m analog)."""

import numpy as np
import jax.numpy as jnp

from sedumi_tpu.cones import Layout
from sedumi_tpu.structs import ConeVec, cv_dot
from sedumi_tpu import nt


def random_interior(rng, layout: Layout) -> ConeVec:
    l = jnp.asarray(rng.uniform(0.5, 2.0, layout.l))
    q = []
    for b in layout.q_buckets:
        bar = rng.normal(size=(b.count, b.dim - 1))
        head = np.linalg.norm(bar, axis=-1) + rng.uniform(0.5, 2.0, b.count)
        q.append(jnp.asarray(np.concatenate([head[:, None], bar], axis=1)))
    s = []
    for b in layout.s_buckets:
        M = rng.normal(size=(b.count, b.dim, b.dim))
        s.append(jnp.asarray(M @ M.transpose(0, 2, 1) + 0.3 * np.eye(b.dim)))
    return ConeVec(l=l, q=tuple(q), s=tuple(s))


LAYOUT = Layout(l=3, q=(3, 3, 5), s=(4, 2, 4))


def test_nt_properties(rng):
    x = random_interior(rng, LAYOUT)
    z = random_interior(rng, LAYOUT)
    S = nt.compute_scaling(x, z)

    # H z = x  (defining NT property)
    hz = nt.H_apply(S, z)
    for a, b in zip(
        [hz.l, *hz.q, *hz.s], [x.l, *x.q, *x.s]
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-10)

    # W^{-1} x = W z = lam, and <lam,lam> = <x,z>
    vx = nt.scale_x_to_v(S, x)
    vz = nt.scale_z_to_v(S, z)
    lam = nt.lam_as_conevec(S)
    for a, b in zip([vx.l, *vx.q, *vx.s], [vz.l, *vz.q, *vz.s]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-9)
    for a, b in zip([vx.l, *vx.q, *vx.s], [lam.l, *lam.q, *lam.s]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(float(cv_dot(x, z)), float(cv_dot(lam, lam)), rtol=1e-10)

    # round-trip scalings
    rt = nt.scale_v_to_x(S, vx)
    for a, b in zip([rt.l, *rt.q, *rt.s], [x.l, *x.q, *x.s]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-10)
    rtz = nt.scale_v_to_z(S, vz)
    for a, b in zip([rtz.l, *rtz.q, *rtz.s], [z.l, *z.q, *z.s]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-10)

    # adjoint identity: <H u, v> = <u, H v>
    u = random_interior(rng, LAYOUT)
    v = random_interior(rng, LAYOUT)
    np.testing.assert_allclose(
        float(cv_dot(nt.H_apply(S, u), v)), float(cv_dot(u, nt.H_apply(S, v))),
        rtol=1e-10,
    )


def test_lam_inv_jmul(rng):
    x = random_interior(rng, LAYOUT)
    z = random_interior(rng, LAYOUT)
    S = nt.compute_scaling(x, z)
    r = random_interior(rng, LAYOUT)
    u = nt.lam_inv_jmul(S, r)
    # lam o u == r
    from sedumi_tpu.ipm import cv_jmul
    lam = nt.lam_as_conevec(S)
    lu = cv_jmul(lam, u)
    for a, b in zip([lu.l, *lu.q, *lu.s], [r.l, *r.q, *r.s]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-9)
