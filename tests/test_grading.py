"""Reference-parity convergence grading (sedumi.m:678-681).

The final r0 normalizes feasibility by 1+maxb+1e-3*maxRb with maxRb the
inf-norm of the sdinit residual direction — the problem-scale relaxation
that lets the reference reach numerr=0 on badly-row-scaled data.  These
tests pin the _residual_scales formula and its effect on grading.
"""

import numpy as np
import scipy.sparse as sp

from sedumi_tpu.cones import Layout
from sedumi_tpu.solver import _residual_scales


def test_residual_scales_formula():
    # LP-only layout: closed-form check of sdinit.m:96-105
    lay = Layout(l=3, q=(), s=())
    At = sp.csc_matrix(np.array([[2.0, 0.0], [0.0, 1.0], [1.0, 1.0]]))
    b = np.array([4.0, 1.0])
    c = np.array([1.0, 2.0, 0.5])
    maxb, maxc = 4.0, 2.0
    mu0 = np.sqrt((1 + maxb) * (1 + maxc))
    d0 = np.sqrt((1 + maxb) / (1 + maxc))
    y0 = (lay.nu + 1.0) * mu0
    e = np.ones(3)
    Rb_ref = (d0 * mu0 * (At.T @ e) - b) / y0
    Rc_ref = ((mu0 / d0) * e - c) / y0
    maxRb, maxRc = _residual_scales(At, b, c, lay)
    assert np.isclose(maxRb, max(1e-6, np.max(np.abs(Rb_ref))))
    assert np.isclose(maxRc, max(1e-6, np.max(np.abs(Rc_ref))))


def test_residual_scales_floor():
    # the reference floors both at 1e-6 (sdinit.m:103-104)
    lay = Layout(l=1, q=(), s=())
    At = sp.csc_matrix(np.array([[1.0]]))
    mu0 = np.sqrt(2.0 * 2.0)
    # b chosen so the residual direction is ~0: b = d0*mu0*A'e
    b = np.array([1.0 * mu0])      # d0 = 1 when maxb == maxc
    c = np.array([mu0])
    maxRb, maxRc = _residual_scales(At, b, c, lay)
    assert maxRb >= 1e-6 and maxRc >= 1e-6
