"""Test config: run everything on the CPU backend with 8 virtual devices.

This is the "fake backend" layer the reference has no equivalent of
(SURVEY.md §4): numerical tests run on JAX CPU; sharding tests see an
8-device mesh via --xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon sitecustomize re-registers the TPU backend and rewrites
# jax_platforms to "axon,cpu"; force CPU after import too
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def demo_wav_path():
    p = "/root/reference/demo.wav"
    if not os.path.exists(p):
        pytest.skip("demo.wav not available")
    return p
