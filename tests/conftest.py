"""Test harness: run everything on CPU with 8 virtual devices.

This is the TPU-world stand-in for multi-chip testing (SURVEY.md §4): sharding
tests get a real 8-device mesh without hardware, and all Pallas kernels are
parity-tested in interpreter mode.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
