"""Schur-panel tensor parallelism tests (parallel/panels.py) on the
virtual 8-device CPU mesh.

Checks the distributed block Cholesky and triangular solves against the
replicated LAPACK answers, and the end-to-end panel-engine solve path
(pars.mesh_shape={"panels": n}) against the replicated dense engine.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _spd(m, rng, cond=1e3):
    Q, _ = np.linalg.qr(rng.standard_normal((m, m)))
    d = np.geomspace(1.0, 1.0 / cond, m)
    return (Q * d) @ Q.T


@needs8
def test_dist_cholesky_matches_lapack(rng):
    from sedumi_tpu.parallel import make_mesh
    from sedumi_tpu.parallel.panels import dist_cholesky

    mesh = make_mesh(8)
    bs = 8
    m = 8 * bs * 3            # 3 local blocks per device
    M = _spd(m, rng)
    L = np.asarray(dist_cholesky(jnp.asarray(M), mesh, "blocks", bs))
    Lref = np.linalg.cholesky(M)
    assert np.allclose(L, Lref, rtol=0, atol=1e-9 * np.abs(Lref).max())
    # strict upper triangle is exactly zero
    assert np.all(np.triu(L, 1) == 0.0)


@needs8
def test_dist_trisolves_match(rng):
    from sedumi_tpu.parallel import make_mesh
    from sedumi_tpu.parallel.panels import _dist_trisolve, dist_cholesky

    mesh = make_mesh(8)
    bs = 4
    m = 8 * bs * 2
    M = _spd(m, rng)
    b = rng.standard_normal(m)
    L = dist_cholesky(jnp.asarray(M), mesh, "blocks", bs)
    y = _dist_trisolve(L, jnp.asarray(b), mesh, "blocks", bs, lower=True)
    x = _dist_trisolve(L, y, mesh, "blocks", bs, lower=False)
    xref = np.linalg.solve(M, b)
    assert np.allclose(np.asarray(x), xref, atol=1e-8 * np.abs(xref).max())


@needs8
def test_panel_engine_solve_matches_dense(rng):
    """PanelSchurEngine.prepare/solve vs DenseSchurEngine on a real
    operator + NT scaling from a small mixed-cone problem."""
    import __graft_entry__ as ge
    from sedumi_tpu import nt
    from sedumi_tpu.ipm import DenseSchurEngine
    from sedumi_tpu.parallel import make_mesh
    from sedumi_tpu.parallel.panels import PanelSchurEngine

    _, (aop, b, rs, state, reg), _ = ge._small_problem(
        n_blocks_s=4, n_blocks_q=4, m=24, seed=1)
    S = nt.compute_scaling(state.x, state.z)

    dense = DenseSchurEngine()
    ctx_d, ahc_d, chc_d, ok_d = dense.prepare(aop, S, reg)
    rhs = jnp.asarray(np.random.default_rng(0).standard_normal(aop.m))
    x_d = np.asarray(dense.solve(ctx_d, rhs))

    mesh = make_mesh(8)
    panel = PanelSchurEngine(mesh, bs=4)
    ctx_p, ahc_p, chc_p, ok_p = panel.prepare(aop, S, reg)
    x_p = np.asarray(panel.solve(ctx_p, rhs))

    assert bool(ok_d) and bool(ok_p)
    assert np.allclose(np.asarray(ahc_p), np.asarray(ahc_d), atol=1e-10)
    assert np.allclose(float(chc_p), float(chc_d), atol=1e-10)
    assert np.allclose(x_p, x_d, rtol=1e-8, atol=1e-10 * np.abs(x_d).max())


@needs8
def test_panel_engine_end_to_end():
    """Full sedumi() solve with pars.mesh_shape={'panels': 8} agrees with
    the replicated solve and reaches the same accuracy."""
    from sedumi_tpu import sedumi
    from sedumi_tpu.generators import feasible_problem

    K = {"l": 6, "q": [4, 4], "s": [6, 6]}
    At, b, c, Kspec = feasible_problem(K, 25, seed=7)
    x0, y0, info0 = sedumi(At, b, c, Kspec, {"fid": 0})
    x1, y1, info1 = sedumi(At, b, c, Kspec,
                           {"fid": 0, "mesh_shape": {"panels": 8}})
    assert info1["pinf"] == 0 and info1["dinf"] == 0
    assert info1["numerr"] < 2
    cx0 = float(np.vdot(c, x0))
    cx1 = float(np.vdot(c, x1))
    assert abs(cx1 - cx0) <= 1e-6 * (1.0 + abs(cx0))
