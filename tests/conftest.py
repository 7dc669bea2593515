"""Test configuration: run everything on a virtual 8-device CPU mesh.

The sandbox's axon TPU plugin force-overrides ``jax_platforms`` to ``axon,cpu`` at jax
import (so a plain ``JAX_PLATFORMS=cpu`` env var is NOT enough — tests would silently
contend over the single tunneled TPU chip). We therefore set the XLA host-device flag
before import and hard-reset the platform list to ``cpu`` after import
(SURVEY.md §4 "Distributed-on-CPU").
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
