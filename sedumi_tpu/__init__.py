"""sedumi_tpu — a TPU-native symmetric-cone interior-point solver.

A brand-new JAX/XLA framework with the full capability surface of
SeDuMi 1.3.7 (MATLAB + C-MEX): linear,
second-order-cone (incl. rotated) and semidefinite programming (real and
complex-Hermitian) over products of symmetric cones, solved with a
homogeneous self-dual embedding and a Nesterov-Todd-scaled wide-region
predictor-corrector interior-point method.

Architecture (TPU-first, NOT a port):
  * Host analysis phase (``transform.py``): problem canonicalization to an
    internal real cone form (reference analog: pretransfo.m), producing a
    static :class:`~sedumi_tpu.cones.Layout` with size-bucketed cone blocks.
  * Device numeric phase: all cone state lives in bucketed dense batches
    (``structs.ConeVec``); Jordan-algebra kernels (``jordan.py``), NT scaling
    (``nt.py``), Schur-complement formation as fused einsums (``schur.py``),
    robust dense Cholesky with SeDuMi's pivot add/skip semantics
    (``chol.py``), matrix-free PCG refinement (``pcg.py``), all jitted.
  * Multi-chip: cone-block sharding + psum ADA reduction over a
    ``jax.sharding.Mesh`` (``parallel/``).

The numeric core requires float64 (reference accuracy target eps=1e-8,
checkpars.m:99-101); we enable jax x64 on import unless SEDUMI_TPU_NO_X64
is set.
"""

from __future__ import annotations

import os

if not os.environ.get("SEDUMI_TPU_NO_X64"):
    import jax

    jax.config.update("jax_enable_x64", True)

# TPUs compute matmuls at bf16 precision by default (observed rel err
# 2.6e-3 even for f64 operands on some TPU plugins); an interior-point
# method is hopeless at that precision.  HIGHEST costs ~20% on the MXU
# and gives full f32 accumulation (rel err ~1.5e-7), the base precision
# the compensated double-float layer (fp.py) builds on.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

if not os.environ.get("SEDUMI_TPU_NO_COMPILE_CACHE"):
    # Host CPUs are weak relative to the device; persist XLA compilations.
    import jax

    # Key the cache by the host CPU model: XLA:CPU persists AOT results
    # with the COMPILING machine's feature set and will load them on a
    # different host (logging "could lead to execution errors such as
    # SIGILL") — observed as SIGABRT/SIGSEGV mid-suite when a cache
    # written on an AMX-capable build host was reused on a smaller VM.
    def _cpu_tag() -> str:
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("model name"):
                        import hashlib

                        return hashlib.sha1(
                            line.encode()).hexdigest()[:8]
        except OSError:
            pass
        import platform

        return platform.machine()

    _cache_dir = os.environ.get(
        "SEDUMI_TPU_CACHE_DIR",
        os.path.expanduser(f"~/.cache/sedumi_tpu_xla_{_cpu_tag()}"),
    )
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from .params import Pars  # noqa: E402
from .cones import ConeSpec  # noqa: E402
from .solver import sedumi  # noqa: E402
from .userapi import eigK, eyeK, cellK, mat, vec  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "sedumi",
    "Pars",
    "ConeSpec",
    "eigK",
    "eyeK",
    "cellK",
    "mat",
    "vec",
]
