"""Backend-aware dense linalg dispatch.

On CPU, LAPACK-backed jnp.linalg.{eigh,eigvalsh} are fastest (and compile
instantly).  On TPU, XLA's eigh compiles catastrophically slowly (minutes
per shape instance); the batched Jacobi solver (lax_eigh.py) compiles in
seconds and is accurate to machine precision at our block sizes.  Dispatch
here; override with SEDUMI_TPU_EIGH=jacobi|xla.
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

from .lax_eigh import jacobi_eigh, jacobi_eigvalsh

# Trace-time override (impl_override): the host driver traces some step
# functions for the TPU (jacobi) and others for the host CPU backend
# (LAPACK) within one process — the heterogeneous-precision design of
# solver.py.  The flag is read at TRACE time only; compiled executables
# are unaffected.
_FORCE_IMPL: str | None = None


@contextlib.contextmanager
def impl_override(impl: str | None):
    """Force the eigh implementation ('jacobi' | 'xla' | None) while
    tracing under this context."""
    global _FORCE_IMPL
    prev = _FORCE_IMPL
    _FORCE_IMPL = impl
    try:
        yield
    finally:
        _FORCE_IMPL = prev


def _use_jacobi() -> bool:
    if _FORCE_IMPL == "jacobi":
        return True
    if _FORCE_IMPL == "xla":
        return False
    impl = os.environ.get("SEDUMI_TPU_EIGH", "auto")
    if impl == "jacobi":
        return True
    if impl == "xla":
        return False
    return jax.default_backend() != "cpu"


def eigh(A: jax.Array, sort: bool = False):
    """(w, V) batched; eigenvalue ORDER IS UNSPECIFIED unless sort=True
    (the IPM never needs it; jnp.sort compiles pathologically on TPU)."""
    if _use_jacobi():
        return jacobi_eigh(A, sort=sort)
    return jnp.linalg.eigh(A)


def eigvalsh(A: jax.Array, sort: bool = False) -> jax.Array:
    if _use_jacobi():
        return jacobi_eigvalsh(A, sort=sort)
    return jnp.linalg.eigvalsh(A)
