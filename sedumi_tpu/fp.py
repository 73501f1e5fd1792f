"""Precision architecture: what the device can actually compute.

The reference assumes solid IEEE f64 everywhere (SURVEY.md hard part 1:
eps=1e-8, canceltol=1e-12, quad-precision CG).  TPUs have no f64 hardware;
on some TPU device plugins f64 *storage* works but multiplies/matmuls silently
round to f32 (measured: elementwise f64 product rel-err ~1e-7, default
matmul rel-err 2.6e-3 = bf16 passes).  The framework therefore treats
precision as an explicit architectural layer:

* base dtype   -- f64 on hosts with real f64 (CPU backend), f32 on TPU.
  All bulk linear algebra (Schur formation, Cholesky, eigensolver,
  triangular solves) runs in base dtype with matmul precision HIGHEST
  (full f32 accumulation on the MXU; set globally in __init__).
* compensated (double-float) layer -- error-free transformations
  (Knuth TwoSum, Dekker/Veltkamp TwoProd) over the base dtype, giving
  ~2x-mantissa effective precision (~1e-14 on f32, ~1e-30 on f64) for
  the accuracy-critical scalars: iterative-refinement residuals of the
  Schur solves (pcg.py) and the solution accumulators (quadadd.c role).
  TwoSum/TwoProd were verified bit-exact on the TPU VPU (f32).

The Veltkamp splitting constant depends on the mantissa width of the
dtype the ops actually round to: 2^ceil(p/2)+1 with p=24 (f32) or p=53
(f64).  Using the f64 constant on a platform that computes at f32 breaks
the error-free property silently — hence this module is the single
source of truth for it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Veltkamp splitting constants: 2^ceil(p/2) + 1
_SPLIT_F32 = 4097.0          # p = 24
_SPLIT_F64 = 134217729.0     # p = 53


@functools.cache
def backend_has_f64() -> bool:
    """True iff the default backend computes f64 products at f64 precision.

    Measured, not assumed (some TPU device plugins emulate f64 in software —
    exact but slow; other backends may silently round to f32).  The probe
    must run OUTSIDE any jit trace: ensure_compile_time_eval guards the
    case where the first caller is itself being traced.
    """
    if not jax.config.jax_enable_x64:
        return False
    if jax.default_backend() == "cpu":
        return True
    with jax.ensure_compile_time_eval():
        a = jnp.asarray(1.0 + 2.0 ** -30, jnp.float64)
        p = float(a * a)
    exact = float(np.float64(1.0 + 2.0 ** -30) ** 2)
    return abs(p - exact) < 1e-18


def resolve_dtype(requested: str | None) -> np.dtype:
    """Map Pars.dtype ('auto'/'float32'/'float64') to the base dtype."""
    if requested in (None, "auto"):
        return np.dtype(np.float64) if backend_has_f64() else np.dtype(np.float32)
    return np.dtype(requested)


def precision_mode(requested: str | None = "auto") -> str:
    """The precision regime the solver should run in.

    'f64'   -- single-dtype f64: backends with native fast f64 (CPU).
    'mixed' -- f32 iterations while they progress, escalate to (software)
               f64 for the endgame: TPU backends that emulate f64 exactly
               but slowly (measured 25x on dense Cholesky).  This is the
               TPU-native answer to SURVEY.md hard part 1.
    'f32'   -- f32 only (+compensated refinement): no usable f64 anywhere,
               or explicitly requested.
    """
    if requested == "mixed":
        # explicit request (testing the full phase ladder on any backend)
        return "mixed"
    if requested in (None, "auto"):
        if jax.default_backend() == "cpu":
            return "f64"
        return "mixed" if backend_has_f64() else "f32"
    return "f64" if np.dtype(requested) == np.float64 else "f32"


def split_const(dtype) -> float:
    """Veltkamp constant for the precision ops on `dtype` actually round to."""
    if np.dtype(dtype) == np.float32:
        return _SPLIT_F32
    # f64 dtype: if the backend only computes f32, the error-free property
    # must target the f32 rounding that actually happens.
    return _SPLIT_F64 if backend_has_f64() else _SPLIT_F32


def eps_for(dtype) -> float:
    """Unit roundoff of the arithmetic that actually executes on `dtype`."""
    if np.dtype(dtype) == np.float32 or not backend_has_f64():
        return float(np.finfo(np.float32).eps)
    return float(np.finfo(np.float64).eps)
