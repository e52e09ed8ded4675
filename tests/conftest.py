"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is unavailable in CI; sharding tests run against
8 virtual CPU devices (the JAX-native substitute for a fake distributed
backend — see SURVEY.md §4).  Must run before the first jax import.
"""

import os

# force CPU: the ambient JAX_PLATFORMS=axon would route tests to the real
# TPU tunnel and defeat the 8-virtual-device mesh below
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon sitecustomize registers the TPU backend at interpreter start and
# pins jax_platforms=axon; the env var alone doesn't win — override the
# config explicitly before any backend is used
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
