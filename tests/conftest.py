"""Test configuration: force an 8-device virtual CPU mesh.

The reference never tests multi-device behaviour (SURVEY.md §4); we do, using
JAX's host-platform device-count mechanism so that every sharding test runs
on CPU without TPU hardware.

Note: this container's sitecustomize registers an `axon` TPU backend and sets
jax_platforms=axon at interpreter start, so we must override via
jax.config.update (env vars alone are ignored once register() has run).
"""
import os

# Must be set before the CPU backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
