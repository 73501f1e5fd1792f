"""Terminal conic refinement (refine.conic_refine).

The optimal-face projection generalizes optstep.m:42-138 from LP to the
full l/q/s family: given a near-optimal iterate it must (a) verify before
accepting, (b) drive r0 (the sedumi.m:678-691 grade) far below the IPM
endgame floor, and (c) never hand back a worse point.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from sedumi_tpu import sedumi
from sedumi_tpu.generators import feasible_problem
from sedumi_tpu.refine import conic_refine, _classify, _proj_face
from sedumi_tpu.cones import Layout


def _end_to_end_r0(K, m, seed):
    At, b, c, Ks = feasible_problem(K, m, seed=seed)
    x, y, info = sedumi(At, b, c, Ks, {"fid": 0})
    assert info["pinf"] == 0 and info["dinf"] == 0
    return info


def test_refine_drives_r0_down_sdp():
    info = _end_to_end_r0({"l": 4, "s": [6, 5]}, 12, seed=3)
    # without refinement the endgame floors ~1e-8..1e-7; the face
    # projection reaches the equality-constrained LS floor
    assert info["r0"] <= 1e-9
    assert info["numerr"] == 0


def test_refine_drives_r0_down_mixed():
    info = _end_to_end_r0({"l": 6, "q": [4, 3], "s": [5]}, 10, seed=7)
    assert info["r0"] <= 1e-9
    assert info["numerr"] == 0


def test_refine_lp_only():
    info = _end_to_end_r0({"l": 25}, 8, seed=1)
    assert info["r0"] <= 1e-9


def test_refine_disabled_flag():
    At, b, c, Ks = feasible_problem({"l": 4, "s": [5]}, 8, seed=2)
    _, _, info_off = sedumi(At, b, c, Ks, {"fid": 0, "refine": 0})
    _, _, info_on = sedumi(At, b, c, Ks, {"fid": 0, "refine": 1})
    assert info_on["r0"] <= info_off["r0"]


def test_conic_refine_rejects_wrong_face():
    """A far-from-optimal interior point must NOT be 'refined': every face
    guess either fails verification or fails to improve r0 -> None/worse."""
    rng = np.random.default_rng(0)
    layout = Layout(l=3, q=(), s=(4,))
    m = 5
    n = layout.N
    A = rng.normal(size=(m, n))
    # symmetrize PSD segment
    blk = A[:, 3:].reshape(m, 4, 4)
    A[:, 3:] = (0.5 * (blk + blk.transpose(0, 2, 1))).reshape(m, -1)
    At = sp.csc_matrix(A.T)
    x = np.concatenate([np.ones(3), np.eye(4).ravel()])   # central, not opt
    y = rng.normal(size=m) * 0.1
    b = A @ x
    c = A.T @ y + x                                       # z = x interior
    cand = conic_refine(At, b, c, layout, x, y, 1.0, 1.0, 1e-8)
    # x strictly interior and z strictly interior => w-split makes the
    # whole space 'primal face', dual projection kills z only if
    # consistent; whatever happens the candidate may not degrade
    if cand is not None:
        rp = np.linalg.norm(b - At.T @ cand.x)
        assert rp <= np.linalg.norm(b - At.T @ x) + 1e-9


def test_classify_and_projector_idempotent():
    rng = np.random.default_rng(4)
    layout = Layout(l=4, q=(3,), s=(5,))
    x = np.concatenate([
        np.array([2.0, 1.0, 1e-9, 3.0]),
        np.array([1.0, 0.6, 0.6]) + np.array([1e-9, 0, 0]),
        (lambda M: (M @ M.T).ravel())(rng.normal(size=(5, 2))),
    ])
    z = np.concatenate([
        np.array([1e-9, 1e-9, 2.0, 1e-9]),
        1e-9 * np.array([1.0, 0.0, 0.0]),
        1e-9 * np.eye(5).ravel(),
    ])
    face = _classify(layout, x, z, 0.0)
    v = rng.normal(size=layout.N)
    pv = _proj_face(layout, face, v)
    ppv = _proj_face(layout, face, pv)
    assert np.allclose(pv, ppv, atol=1e-12)
    # projection of x itself keeps it (x is supported on its own face)
    px = _proj_face(layout, face, x)
    assert np.linalg.norm(px - x) <= 1e-6 * np.linalg.norm(x)


def test_refine_soc_ray_face():
    """SOC block on its boundary ray: classification must find the ray and
    the projector must reproduce it."""
    layout = Layout(l=0, q=(4,), s=())
    u = np.array([1.0, 0.8, -0.6, 0.0])       # x on boundary: x0 = ||xbar||
    x = 2.5 * u
    z = 1e-10 * np.array([1.0, -0.8, 0.6, 0.0])   # complementary ray
    face = _classify(layout, x, z, 0.0)
    assert face.q_kind[0] == "ray"
    px = _proj_face(layout, face, x)
    assert np.allclose(px, x, atol=1e-9)
    pz = _proj_face(layout, face, z)
    assert np.linalg.norm(pz) <= 1e-12
