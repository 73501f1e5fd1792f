"""Test configuration: force the CPU backend with 8 virtual devices.

jax is pre-imported in this environment with jax_platforms=axon,cpu (the
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
