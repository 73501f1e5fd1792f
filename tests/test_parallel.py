"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates the cone-block data-parallel plan (parallel/mesh.py): the jitted
IPM step must compile and run with the block axis sharded over the mesh,
produce finite stats, and agree numerically with the unsharded step.
"""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    jax.block_until_ready(out)
    assert np.isfinite(float(out[1].mu))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multi-device")
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_matches_unsharded():
    import __graft_entry__ as ge
    from sedumi_tpu.parallel import make_mesh, shard_aop, shard_state
    from sedumi_tpu.parallel.mesh import replicate

    step, (aop, b, rs, state, reg), _ = ge._small_problem(
        n_blocks_s=8, n_blocks_q=8, m=7, seed=3
    )
    ref_state, ref_stats = step(aop, b, rs, state, reg)

    mesh = make_mesh(8)
    sh_state, sh_stats = step(
        shard_aop(aop, mesh),
        *replicate((b, rs), mesh),
        shard_state(state, mesh),
        *replicate((reg,), mesh),
    )
    np.testing.assert_allclose(float(sh_stats.mu), float(ref_stats.mu), rtol=1e-10)
    np.testing.assert_allclose(float(sh_stats.alpha), float(ref_stats.alpha), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(sh_state.y), np.asarray(ref_state.y), rtol=1e-7, atol=1e-10
    )
