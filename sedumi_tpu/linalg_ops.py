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


def eigh(A: jax.Array, sort: bool = False, sweeps: int | None = None):
    """(w, V) batched; eigenvalue ORDER IS UNSPECIFIED unless sort=True
    (the IPM never needs it; jnp.sort compiles pathologically on TPU).
    `sweeps` caps the Jacobi budget (coarse line-search spectra); the
    LAPACK path ignores it."""
    if _use_jacobi():
        return jacobi_eigh(A, sweeps=sweeps, sort=sort)
    return jnp.linalg.eigh(A)


def eigvalsh(A: jax.Array, sort: bool = False,
             sweeps: int | None = None) -> jax.Array:
    if _use_jacobi():
        return jacobi_eigvalsh(A, sweeps=sweeps, sort=sort)
    return jnp.linalg.eigvalsh(A)


def _pad_stack(mats):
    """Stack [k_i, d_i, d_i] batches into one [sum k_i, dmax, dmax] batch,
    padding each block with a decoupled unit diagonal (identity rotations
    in the Jacobi kernel never mix the padding in, so the leading d_i x d_i
    corner of the result is exactly the unpadded answer)."""
    import jax.numpy as jnp

    dmax = max(a.shape[-1] for a in mats)
    padded = []
    for a in mats:
        d = a.shape[-1]
        if d < dmax:
            p = jnp.zeros(a.shape[:-2] + (dmax, dmax), a.dtype)
            p = p.at[..., :d, :d].set(a)
            idx = jnp.arange(d, dmax)
            p = p.at[..., idx, idx].set(1.0)
            a = p
        padded.append(a)
    return jnp.concatenate(padded, axis=0), dmax


def eigh_multi(mats, sweeps: int | None = None):
    """Batched eigh over a LIST of per-bucket [k_i, d_i, d_i] batches in
    ONE Jacobi kernel call (pad to dmax + concatenate).

    The Jacobi solver's cost on TPU is dominated by its sequential
    rotation-round loop (latency, not flops) — running b buckets as one
    padded batch costs max(rounds) instead of sum(rounds), ~2x on
    two-bucket SDPs like arch0/trto3 (measured 375 ms/iter of NT eigh on
    arch0 before).  Eigenvalues are UNSORTED (padding occupies trailing
    diagonal slots, so slicing requires unsorted output).
    """
    if len(mats) <= 1 or not _use_jacobi():
        return [eigh(a, sweeps=sweeps) for a in mats]
    A, _ = _pad_stack(mats)
    w, V = jacobi_eigh(A, sweeps=sweeps, sort=False)
    out = []
    off = 0
    for a in mats:
        k, d = a.shape[0], a.shape[-1]
        out.append((w[off:off + k, :d], V[off:off + k, :d, :d]))
        off += k
    return out


def eigh_herm_multi(mats, sweeps: int | None = None):
    """Batched eigh for LISTS of complex Hermitian [k_i, d_i, d_i] batches
    in one complex-Jacobi call (native K.scomplex path; half the rotation
    rounds of the real embedding).  LAPACK path on CPU."""
    from .lax_eigh import jacobi_eigh_herm

    if not _use_jacobi():
        return [jnp.linalg.eigh(a) for a in mats]
    if len(mats) <= 1:
        return [jacobi_eigh_herm(a, sweeps=sweeps) for a in mats]
    A, _ = _pad_stack(mats)
    w, V = jacobi_eigh_herm(A, sweeps=sweeps)
    out = []
    off = 0
    for a in mats:
        k, d = a.shape[0], a.shape[-1]
        out.append((w[off:off + k, :d], V[off:off + k, :d, :d]))
        off += k
    return out


def eigvalsh_multi(mats, sweeps: int | None = None):
    """eigh_multi without vectors; returns a list of [k_i, d_i] batches."""
    if len(mats) <= 1 or not _use_jacobi():
        return [eigvalsh(a, sweeps=sweeps) for a in mats]
    A, _ = _pad_stack(mats)
    w = jacobi_eigvalsh(A, sweeps=sweeps, sort=False)
    out = []
    off = 0
    for a in mats:
        k, d = a.shape[0], a.shape[-1]
        out.append(w[off:off + k, :d])
        off += k
    return out
