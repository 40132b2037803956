"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the survey's test-strategy note (SURVEY.md §4): multi-chip code is
validated on a simulated mesh via --xla_force_host_platform_device_count;
the real-TPU path is exercised by bench.py / the driver.
"""
import os

# The axon sitecustomize pins JAX_PLATFORMS=axon (remote TPU); tests must
# run locally, so override unconditionally before jax is imported.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter boot, so the env vars
# above are too late for it; override through the config API as well.
jax.config.update("jax_platforms", "cpu")

# NOTE: the persistent compilation cache is intentionally NOT enabled here.
# In this environment CPU AOT artifacts can be produced by a remote compile
# service with mismatched host features (+prefer-no-scatter etc.); loading
# them intermittently SIGSEGVs (see cpu_aot_loader warnings). Fresh local
# compiles are slower but stable.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
