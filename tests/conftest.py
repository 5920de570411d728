"""Test harness: run everything on CPU with 8 virtual XLA devices.

This is the TPU-world equivalent of a fake distributed backend (SURVEY.md §4):
multi-chip sharding tests execute on an 8-device host mesh, and numerics tests
avoid TPU default-precision differences. Must run before jax is imported.
"""

import os

# Force CPU even when the session default points at a TPU platform: tests
# need f32 numerics and 8 virtual devices for the mesh tests. jax may already
# be imported by a sitecustomize hook, so set the config programmatically too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
