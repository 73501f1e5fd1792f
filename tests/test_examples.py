"""The reference's 6-problem correctness gate (examples/test_sedumi.m:22-44).

Acceptance: objective parity vs the published optima at rel-err 1e-6, with
pinf=dinf=0 and numerr<2.

Exception, documented: **control07**'s published value -2.062510e+01 is
SDPLIB's 6-significant-digit value zero-padded.  Our solver produces an
*exactly dual-feasible* certificate (z = c - A'y with lambda_min(z) > 0
verified in exact original data), proving p* >= b'y = -20.6250729; the true
optimum rounds to 2.06251e+01 at 6 digits, consistent with SDPLIB.  We
therefore gate control07 at rel 2.5e-6 against the padded value while also
checking the much tighter primal/dual agreement of our own solution.

quantum + nb + control07 run in the default suite; arch0 is ~25s on the
2-vCPU CI host (marked slow); trto3 / OH are large (marked slow, intended
for TPU bench runs).
"""

import numpy as np
import pytest

from sedumi_tpu import sedumi
from sedumi_tpu.examples import load_example


def _solve_and_check(name: str, tol: float = 1e-6):
    ex = load_example(name)
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
    _solve_and_check("control07", tol=2.5e-6)


@pytest.mark.slow
def test_arch0():
    _solve_and_check("arch0")


@pytest.mark.slow
def test_trto3():
    _solve_and_check("trto3")


@pytest.mark.slow
def test_oh():
    _solve_and_check("OH_2Pi_STO-6GN9r12g1T2")
