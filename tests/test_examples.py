"""The reference's 6-problem correctness gate (examples/test_sedumi.m:22-44).

Acceptance: objective parity vs the published optima at rel-err 1e-6, with
pinf=dinf=0 and numerr<2.

control07 history: round 1 gated it at 2.5e-6 with a dual-feasibility
argument about SDPLIB's 6-digit published value.  With the wide-region
neighborhood now on by default (pars.wr=1, the reference's own default
method), control07 converges to rel 5e-8 against the published value — the
loosened gate was masking a solver weakness, not a data problem; it is
back at the reference's own 1e-6.

quantum + nb + control07 run in the default suite; arch0 is ~25s on the
2-vCPU CI host (marked slow); trto3 / OH are large (marked slow, intended
for TPU bench runs).
"""

import numpy as np
import pytest

from sedumi_tpu import sedumi
from sedumi_tpu.examples import load_example


def _solve_and_check(name: str, tol: float = 1e-6):
    try:
        ex = load_example(name)
    except FileNotFoundError:
        pytest.skip(f"{name}.mat not available (not vendored; set "
                    "SEDUMI_EXAMPLES_DIR)")
    x, y, info = sedumi(ex.At, ex.b, ex.c, ex.K, {"fid": 0})
    assert info["pinf"] == 0 and info["dinf"] == 0
    assert info["numerr"] < 2
    cx = float(np.real(np.vdot(ex.c, x)))
    by = float(np.real(np.vdot(ex.b, y)))
    ref = ex.optval
    assert abs(cx - ref) <= tol * abs(ref), f"{name}: cx={cx} vs ref={ref}"
    assert abs(by - ref) <= tol * abs(ref), f"{name}: by={by} vs ref={ref}"
    # primal/dual agreement of our own solution pair
    assert abs(cx - by) <= 1e-5 * (1 + abs(cx))
    return x, y, info


def test_quantum():
    # complex Hermitian SDP with ycomplex constraint splitting
    _solve_and_check("quantum")


def test_nb():
    # 793 Lorentz cones + dense columns
    _solve_and_check("nb")


def test_control07():
    # see module docstring: published value is 6-digit accurate only
    _solve_and_check("control07")


@pytest.mark.slow
def test_arch0():
    _solve_and_check("arch0")


@pytest.mark.slow
def test_trto3():
    _solve_and_check("trto3")


@pytest.mark.slow
def test_oh():
    _solve_and_check("OH_2Pi_STO-6GN9r12g1T2")
