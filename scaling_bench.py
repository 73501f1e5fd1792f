"""Multi-chip scaling-efficiency measurement (BASELINE.md north star:
>= 70% iterations/s efficiency 1 chip -> 1 host -> 4 hosts).

Real multi-chip hardware is not available in this environment, so this
measures the SPMD program on a virtual CPU device mesh: the block-sharded
operator + state vs the same program on one device.  That validates the
sharding/collective structure (XLA inserts the psum for the ADA reduction)
and gives an upper-bound-structure check, NOT real ICI numbers — the
result file says so explicitly.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python scaling_bench.py
Writes SCALING.json.
"""

from __future__ import annotations

import json
import os
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def bench(n_devices: int, n_blocks: int = 32, d: int = 48, m: int = 24,
          iters: int = 10, panels: bool = False) -> float:
    import jax.numpy as jnp  # noqa: F401

    from sedumi_tpu import ipm
    from sedumi_tpu.generators import feasible_problem
    from sedumi_tpu.opA import build_dense_aop
    from sedumi_tpu.params import Pars
    from sedumi_tpu.parallel import make_mesh, shard_aop, shard_state
    from sedumi_tpu.parallel.mesh import replicate
    from sedumi_tpu.transform import pretransfo
    import scipy.sparse as sp

    K = {"l": 4, "s": [d] * n_blocks}
    At, b, c, Kspec = feasible_problem(K, m, seed=0)
    pars = Pars(fid=0, pack_dim=0, pack_round=0)
    prob = pretransfo(At, b, c, Kspec, pars)
    layout = prob.layout
    rnorm = np.sqrt(
        np.asarray(prob.At.multiply(prob.At).sum(axis=0)).ravel() + prob.b**2)
    rowscale = np.where(rnorm > 0, 1.0 / np.maximum(rnorm, 1e-300), 1.0)
    At_s = sp.csc_matrix(prob.At) @ sp.diags(rowscale)
    b_s = prob.b * rowscale
    aop = build_dense_aop(At_s, prob.c, layout)
    normb = float(np.max(np.abs(b_s)))
    normc = float(np.max(np.abs(prob.c)))
    state = ipm.init_state(layout, aop, b_s, normb, normc, pars)
    engine = None
    if panels and n_devices > 1:
        from sedumi_tpu.parallel.panels import PanelSchurEngine

        engine = PanelSchurEngine(make_mesh(n_devices), bs=8)
    step = ipm.make_step(layout, pars, normb, normc, engine=engine)
    import jax.numpy as jnp

    b_d, rs_d = jnp.asarray(b_s), jnp.asarray(rowscale)
    reg = jnp.asarray(0.0)
    if n_devices > 1:
        mesh = make_mesh(n_devices)
        aop = shard_aop(aop, mesh)
        state = shard_state(state, mesh)
        b_d, rs_d, reg = replicate((b_d, rs_d, reg), mesh)
    # warm
    st, _ = step(aop, b_d, rs_d, state, reg)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    s = state
    for _ in range(iters):
        s, _ = step(aop, b_d, rs_d, s, reg)
    jax.block_until_ready(s)
    return iters / (time.perf_counter() - t0)


def bench_panel_factor(n_devices: int, m: int = 2048, bs: int = 128,
                       reps: int = 3) -> dict:
    """Direct dist_cholesky (block-cyclic) vs replicated LAPACK cholesky at
    the m-scale VERDICT asked for (m ~ 2000-5000)."""
    import jax.numpy as jnp

    from sedumi_tpu.parallel import make_mesh
    from sedumi_tpu.parallel.panels import dist_cholesky

    rng = np.random.default_rng(0)
    B = rng.standard_normal((m, m))
    M = jnp.asarray(B @ B.T + m * np.eye(m))
    mesh = make_mesh(n_devices)

    f_rep = jax.jit(jnp.linalg.cholesky)
    jax.block_until_ready(f_rep(M))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(f_rep(M))
    t_rep = (time.perf_counter() - t0) / reps

    f_dist = jax.jit(lambda A: dist_cholesky(A, mesh, "blocks", bs))
    jax.block_until_ready(f_dist(M))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(f_dist(M))
    t_dist = (time.perf_counter() - t0) / reps
    return {"m": m, "bs": bs, "replicated_chol_s": round(t_rep, 4),
            "dist_chol_cyclic_s": round(t_dist, 4)}


def main() -> None:
    n_max = min(8, len(jax.devices()))
    r1 = bench(1)
    rn = bench(n_max)
    rp = bench(n_max, panels=True)
    pf = bench_panel_factor(n_max)
    eff = rn / (r1 * n_max)
    out = {
        "kind": "virtual-cpu-mesh scaling (structure validation, NOT real "
                "ICI hardware numbers)",
        "devices": n_max,
        "iters_per_sec_1dev": round(r1, 3),
        f"iters_per_sec_{n_max}dev": round(rn, 3),
        f"iters_per_sec_{n_max}dev_panels": round(rp, 3),
        "panel_factor_m2048": pf,
        "panel_routing_rule": (
            "On a shared-memory virtual mesh every 'device' competes for "
            "the same 2 host vCPUs, so the replicated LAPACK factor wins "
            "on wall-clock at any m reachable here; the panel engine is "
            "structure validation (block-cyclic ownership, bs=128). "
            "Routing: keep the replicated engine below m~2000 on real "
            "chips; enable pars.mesh_shape={'panels': n} above it, where "
            "the O(m^3) factor dominates the O(m/bs) per-column "
            "all-gathers."),
        "efficiency_vs_linear": round(eff, 4),
        "note": "On a shared-memory virtual mesh, per-device throughput is "
                "bounded by the 2 host vCPUs; the number validates that the "
                "sharded programs (cone-block DP, and DP + Schur-panel TP "
                "with the distributed block Cholesky) run without "
                "pathological collectives, not chip-scaling.",
    }
    with open("SCALING.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
