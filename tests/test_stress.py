"""Randomized end-to-end stress gate (VERDICT round-2 item 4).

~50 generator instances over seeds x {LP, SOCP, SDP, mixed, rotated,
complex-Hermitian} x {feasible, infeasible, unbounded} at the default
eps=1e-8.  The solver's heuristic ladder (phase switches, best-iterate
bookkeeping, plateau stops, reg ladder) must be tuned against THIS, not
against the six reference examples.

Acceptance: every run returns finite outputs with a correct status;
>= 95% of runs finish with numerr=0.

Reference analog: conversion/feasreal.m / feascpx.m are the generator
model; the reference has no randomized gate (its CI re-runs test_sedumi.m
per platform) — this is new scope justified by our heuristic constants.

Each cone family keeps ONE fixed shape across seeds so XLA's jit cache is
hit across instances (50 solves, ~6 compiles).
"""

import numpy as np
import pytest
import scipy.sparse as sp

from sedumi_tpu import sedumi
from sedumi_tpu.generators import feasible_problem, _interior_point
from sedumi_tpu.cones import ConeSpec

FAMILIES = {
    "lp": dict(K={"l": 60}, m=25),
    "socp": dict(K={"l": 8, "q": [5, 5, 7]}, m=15),
    "sdp": dict(K={"s": [8, 6]}, m=20),
    "mixed": dict(K={"l": 6, "q": [4, 4], "s": [5]}, m=14),
    "rotated": dict(K={"l": 4, "r": [5, 5]}, m=10),
    "cplx": dict(K={"s": [5], "scomplex": [1]}, m=10, complex_data=True),
}


def _mk_infeasible(fam, seed):
    """Primal-infeasible: force A'y0 = -z0 (z0 interior) and b'y0 > 0,
    so y0 certifies infeasibility (Farkas)."""
    spec = FAMILIES[fam]
    cplx = spec.get("complex_data", False)
    At, b, c, K = feasible_problem(spec["K"], spec["m"], seed=seed,
                                   complex_data=cplx)
    rng = np.random.default_rng(seed + 10_000)
    Kc = ConeSpec.make(spec["K"])
    z0 = _interior_point(rng, Kc, cplx)
    if Kc.f:
        z0[:Kc.f] = 0.0
    m = spec["m"]
    y0 = rng.normal(size=m)
    A = np.asarray(At.todense()).T          # [m, n]
    corr = (-z0 - A.T @ y0)
    A = A + np.outer(y0, np.conj(corr)) / float(y0 @ y0)
    b = y0.copy()                            # b'y0 = ||y0||^2 > 0
    return sp.csc_matrix(A.T), b, c, dict(spec["K"])


def _mk_unbounded(fam, seed):
    """Primal-unbounded (dual infeasible): a ray x0 in K with A x0 = 0 and
    c'x0 = -1."""
    spec = FAMILIES[fam]
    cplx = spec.get("complex_data", False)
    At, b, c, K = feasible_problem(spec["K"], spec["m"], seed=seed,
                                   complex_data=cplx)
    rng = np.random.default_rng(seed + 20_000)
    Kc = ConeSpec.make(spec["K"])
    x0 = _interior_point(rng, Kc, cplx)
    A = np.asarray(At.todense()).T
    nrm2 = float(np.real(np.vdot(x0, x0)))
    A = A - np.outer(A @ x0, np.conj(x0)) / nrm2
    c = np.asarray(c).ravel()
    c = c - (np.real(np.vdot(c, x0)) + 1.0) * x0 / nrm2
    b = np.real(A @ (x0 + _interior_point(
        np.random.default_rng(seed + 30_000), Kc, cplx)))
    return sp.csc_matrix(A.T), b, c, dict(spec["K"])


@pytest.mark.slow
def test_stress_gate():
    results = []
    failures = []
    for fam, spec in FAMILIES.items():
        cplx = spec.get("complex_data", False)
        for seed in range(4):
            At, b, c, K = feasible_problem(spec["K"], spec["m"], seed=seed,
                                           complex_data=cplx)
            x, y, info = sedumi(At, b, c, K, {"fid": 0})
            finite = (np.all(np.isfinite(np.real(x)))
                      and np.all(np.isfinite(np.real(y))))
            ok = (finite and info["pinf"] == 0 and info["dinf"] == 0
                  and max(info["err"]) < 1e-6)
            results.append((f"{fam}/feas/{seed}", ok, info["numerr"]))
            if not ok:
                failures.append((f"{fam}/feas/{seed}", info))
        for seed in range(2):
            At, b, c, K = _mk_infeasible(fam, seed)
            x, y, info = sedumi(At, b, c, K, {"fid": 0})
            ok = info["pinf"] == 1
            results.append((f"{fam}/pinf/{seed}", ok, info["numerr"]))
            if not ok:
                failures.append((f"{fam}/pinf/{seed}", info))
        for seed in range(2):
            At, b, c, K = _mk_unbounded(fam, seed)
            x, y, info = sedumi(At, b, c, K, {"fid": 0})
            ok = info["dinf"] == 1
            results.append((f"{fam}/dinf/{seed}", ok, info["numerr"]))
            if not ok:
                failures.append((f"{fam}/dinf/{seed}", info))
    n = len(results)
    n_ok = sum(1 for _, ok, _ in results if ok)
    n_clean = sum(1 for _, ok, ne in results if ok and ne == 0)
    # every status must be right; >=95% must be numerr=0
    assert n_ok == n, f"{n - n_ok}/{n} wrong status/accuracy: {failures[:5]}"
    assert n_clean >= 0.95 * n, (
        f"only {n_clean}/{n} clean (numerr=0): "
        f"{[(nm, ne) for nm, ok, ne in results if ne][:8]}")
