"""Test configuration: force the CPU backend with 8 virtual devices.

jax may be pre-imported in this environment with a TPU device plugin (a
TPU tunnel); tests must run on host CPU with a virtual 8-device mesh for
the multi-chip sharding tests (SURVEY.md: test sharding on a virtual
8-device CPU mesh).  XLA_FLAGS must be set before backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_caches_between_modules():
    """Release compiled-executable state after each test module.

    The full suite compiles hundreds of distinct step graphs; accumulated
    single-process compilation state crashed full-suite runs at ~80%
    progress (round-4 verdict: 3/3 segfaults, every subset green in
    isolation).  Tests within a module share layouts/jit caches, so the
    per-module drop costs little recompilation; across modules reuse is
    rare anyway.
    """
    yield
    jax.clear_caches()
    import gc

    gc.collect()
