"""Per-phase device timers and analytic FLOP counts for the hot path.

Reference analog: the reference reports Pre/IPM/Post wall+cpu timings
(sedumi.m:218-219, Changelog.md:173-180 explains why: the IPM loop is >99%
of runtime and optimization must be data-driven).  The TPU build goes
further: the per-iteration hot phases (NT scaling incl. batched eigh,
Schur formation, Cholesky factorization, direction solves) are measured on
device with block_until_ready fences, and the Schur+Cholesky work is
converted to TFLOP/s against analytic flop counts — BASELINE.md's
"speed-of-light per chip" metric.

Phase timing re-runs the phases as separate jitted calls on the current
iterate (one extra iteration's worth of work, only when pars.profile=1);
the production step stays a single fused jit.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp

from . import nt
from .chol import chol_factor
from .opA import CooAOp, DenseAOp
from .schur import build_schur



def _fence(out):
    """Force completion of the dispatched computation.

    jax.block_until_ready does NOT reliably wait on tunnel-style device
    backends (measured: 0.12 ms for a 2e12-flop Schur formation => the
    call only timed the dispatch).  Fetching any output value requires
    the whole executable to finish, so fetch the first leaf.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf)
    return out


def schur_flops(aop) -> float:
    """Analytic flop count of one augmented-Schur formation M=[A;c']H[A;c']'.

    Dense LP/SOC GEMMs + per-PSD-bucket cost of the representation actually
    used (dense congruence+BB' vs sparse outer-product formation)."""
    mp1 = aop.m + 1
    fl = 0.0
    if aop.Al.shape[1]:
        fl += 2.0 * mp1 * mp1 * aop.Al.shape[1]
    for (c, d) in aop.q_shapes:
        fl += 2.0 * mp1 * c * d          # u = <Aq, wb>
        fl += 2.0 * mp1 * mp1 * c        # rank-1 GEMM
        fl += 2.0 * mp1 * mp1 * c * d    # J-part GEMM
    if isinstance(aop, CooAOp):
        for rep, k, d, G, pad2, T in aop.s_meta:
            if rep == "coo":
                fl += 2.0 * G * pad2 * d * d + 2.0 * T * mp1
            else:
                fl += 4.0 * mp1 * k * d**3 + 2.0 * mp1 * mp1 * k * d * d
    elif isinstance(aop, DenseAOp):
        for (k, d) in aop.s_shapes:
            fl += 4.0 * mp1 * k * d**3 + 2.0 * mp1 * mp1 * k * d * d
    return fl


def chol_flops(m: int) -> float:
    """Dense Cholesky of the m x m Schur complement."""
    return m**3 / 3.0


def eigh_flops(layout) -> float:
    """Batched symmetric eigendecomposition cost of one NT scaling
    (~9 n^3 per dense eigh with eigenvectors, standard LAPACK estimate)."""
    fl = 0.0
    for b in layout.s_buckets:
        fl += 9.0 * b.count * b.dim**3
        fl += 2.0 * b.count * b.dim**3   # Cholesky of Z + congruences
    return fl


def profile_iteration(aop, state, reg) -> dict[str, Any]:
    """Measure the hot phases on the current iterate (device-fenced).

    Returns a dict with per-phase milliseconds and achieved TFLOP/s for the
    Schur formation and Cholesky factorization."""
    m = aop.m

    scaling = jax.jit(lambda x, z: nt.compute_scaling(x, z))
    schur = jax.jit(lambda a, s: build_schur(a, s))
    factor = jax.jit(lambda M, r: chol_factor(M[:m, :m], r))

    def timed(fn, *args, repeats: int = 3):
        out = _fence(fn(*args))                      # compile + warm
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = _fence(fn(*args))
        return out, (time.perf_counter() - t0) / repeats * 1e3

    S, t_scal = timed(scaling, state.x, state.z)
    M, t_schur = timed(schur, aop, S)
    _, t_chol = timed(factor, M, jnp.asarray(reg, M.dtype))

    fl_schur = schur_flops(aop)
    fl_chol = chol_flops(m)
    return {
        "nt_scaling_ms": round(t_scal, 3),
        "schur_ms": round(t_schur, 3),
        "chol_ms": round(t_chol, 3),
        "schur_tflops": round(fl_schur / (t_schur * 1e-3) / 1e12, 4),
        "chol_tflops": round(fl_chol / (t_chol * 1e-3) / 1e12, 4),
        "schur_flop_count": fl_schur,
        "chol_flop_count": fl_chol,
    }


def bench_large_block(d: int = 1024, k: int = 1, m: int = 512,
                      dtype=jnp.float32, repeats: int = 3) -> dict[str, Any]:
    """Synthetic large-block Schur + Cholesky throughput probe.

    The six reference examples max out at d=544 with tiny m, where every
    kernel is latency-bound; this measures the MXU-bound regime the
    framework is designed for (BASELINE.md "Schur+Chol at speed-of-light
    per chip"): one congruence+BB' Schur formation over a [m+1, k, d, d]
    constraint bucket and one dense Cholesky of the m x m result.
    Returns achieved TFLOP/s against analytic flop counts.
    """
    import numpy as np

    from .schur import _psd_contrib

    rng = np.random.default_rng(0)
    mp1 = m + 1
    as_ = jnp.asarray(rng.normal(size=(mp1, k * d * d)).astype(dtype))
    r = jnp.asarray(
        (np.eye(d)[None] + 0.1 * rng.normal(size=(k, d, d))).astype(dtype))

    schur = jax.jit(lambda a, rr: _psd_contrib(a, k, d, rr))
    factor = jax.jit(
        lambda M: chol_factor(M[:m, :m]
                              + jnp.asarray(np.float64(m), dtype)
                              * jnp.eye(m, dtype=dtype),
                              jnp.zeros((), dtype)))

    def timed(fn, *args):
        out = _fence(fn(*args))
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = _fence(fn(*args))
        return out, (time.perf_counter() - t0) / repeats * 1e3

    M, t_schur = timed(schur, as_, r)
    _, t_chol = timed(factor, M)
    fl_schur = 4.0 * mp1 * k * float(d) ** 3 + 2.0 * mp1 * mp1 * k * d * d
    fl_chol = chol_flops(m)
    return {
        "d": d, "k": k, "m": m, "dtype": str(jnp.dtype(dtype)),
        "schur_ms": round(t_schur, 3),
        "chol_ms": round(t_chol, 3),
        "schur_tflops": round(fl_schur / (t_schur * 1e-3) / 1e12, 2),
        "chol_tflops": round(fl_chol / (t_chol * 1e-3) / 1e12, 2),
    }


def profile_sparse_iteration(engine, aop, state, reg) -> dict[str, Any]:
    """Per-phase device timing for the tile-supernodal sparse engine
    (sparse_engine.TileSchurEngine): NT scaling, prepare (sparse ADA
    assembly + level-scheduled tile factorization + dense-column Woodbury),
    and one direction solve (tile triangular solves + PCG refinement).
    Complements profile_iteration (dense engine); same pars.profile=1
    contract."""
    from . import nt as _nt

    scaling = jax.jit(lambda x, z: _nt.compute_scaling(x, z))

    def timed(fn, *args, repeats: int = 3):
        out = _fence(fn(*args))
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = _fence(fn(*args))
        return out, (time.perf_counter() - t0) / repeats * 1e3

    S, t_scal = timed(scaling, state.x, state.z)
    # the tile ctx carries plan arrays that must not cross a jit boundary;
    # time prepare alone and prepare+solve fused, report the difference
    prep_only = jax.jit(lambda a, s, r: engine.prepare(a, s, r)[1:])

    def _prep_solve(a, s, r, b):
        ctx, *_ = engine.prepare(a, s, r)
        return engine.solve(ctx, b)

    prep_solve = jax.jit(_prep_solve)
    _, t_prep = timed(prep_only, aop, S, reg)
    rhs = jnp.ones((aop.m,), jnp.asarray(reg).dtype)
    _, t_both = timed(prep_solve, aop, S, reg, rhs)
    return {
        "nt_scaling_ms": round(t_scal, 3),
        "prepare_ms": round(t_prep, 3),    # ADA assembly + tile factor
        "solve_ms": round(max(t_both - t_prep, 0.0), 3),  # tri solves + PCG
    }
