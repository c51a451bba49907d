"""Test harness: run everything on CPU with 8 virtual devices.

This is the TPU-world stand-in for multi-chip testing (SURVEY.md §4): sharding
tests get a real 8-device mesh without hardware, and all Pallas kernels are
parity-tested in interpreter mode.
"""

import os

# Force CPU: the dev image's sitecustomize registers an 'axon' TPU-tunnel jax
# backend at interpreter start (it sets jax_platforms='axon,cpu' itself and
# ignores JAX_PLATFORMS), so select cpu via jax.config before any backend use.
# Tests then run on the virtual 8-device CPU mesh (the TPU-world stand-in for
# multi-chip testing, SURVEY.md §4).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
