"""Test configuration: CPU backend with a virtual 8-device mesh.

The reference has no distributed test harness at all (SURVEY.md §4); this is
the JAX-native 'fake backend' — multi-chip sharding logic is exercised on
8 virtual CPU devices so tests never need TPU hardware.

NOTE: this environment pre-imports jax at interpreter start (sitecustomize
registers the TPU plugin), so env vars alone are too late — we must override
via jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
