"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/halo-exchange tests
exercise a real multi-device mesh without TPU hardware (the standard
JAX trick; SURVEY.md section 4d). Must run before jax is imported.

Set CFD_TEST_PLATFORM=tpu to keep the TPU backend instead -- that runs
the hardware-only suite (tests/test_pallas_tpu.py) and skips the
multi-device sharding tests (one chip):

    CFD_TEST_PLATFORM=tpu python -m pytest tests/test_pallas_tpu.py -q
"""
import os

_PLATFORM = os.environ.get("CFD_TEST_PLATFORM", "cpu")

if _PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if _PLATFORM == "cpu":
    # The container's sitecustomize force-registers the TPU backend and
    # overrides JAX_PLATFORMS; this wins over the env var.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def linf(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float64)
                               - np.asarray(b, np.float64))))
