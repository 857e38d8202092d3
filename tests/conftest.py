"""Test harness: force 8 virtual CPU devices BEFORE jax initializes.

The axon sitecustomize pins JAX_PLATFORMS=axon (real TPU); tests must run on
CPU with a virtual 8-device mesh (SURVEY.md §4.3 — the standard JAX answer to
multi-device testing without a cluster). Env vars alone are overridden, so we
also set the in-process config before any jax op runs.
"""

import os

_REAL_TPU = os.environ.get("CL_TPU_TESTS") == "1"  # tests/tpu/ on the chip

if not _REAL_TPU:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if not _REAL_TPU:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return devs[:8]
