"""Test configuration: force an 8-device virtual CPU platform.

Mirrors the reference's single-process Catch2 harness (SURVEY.md §4) but adds
what it lacks: multi-device sharding tests run on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`).

NOTE: the environment's sitecustomize imports jax at interpreter startup and
registers the TPU (axon) backend, so env vars alone are too late here — we
must go through jax.config. XLA_FLAGS still works because the CPU client is
created lazily.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# ZENSLAM_TEST_TPU=1 leaves the default (axon TPU) platform in place so the
# @pytest.mark.tpu compiled-kernel parity tests can run on the real chip
# (scripts/tpu_kernel_parity.py); the normal suite always forces CPU.
if os.environ.get("ZENSLAM_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Free compiled-executable state at module boundaries.

    One pytest process compiles many hundreds of XLA programs over the full
    suite; the accumulated compiler/executable state eventually segfaults
    the CPU backend on the largest late-suite programs (observed
    deterministically in test_system after ~200 green tests — the same
    compile passes in a fresh process). Dropping the jit caches lets the
    executables be collected and keeps the process bounded."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs a real TPU device (always skips in the CPU-forced suite; "
        "run via scripts/tpu_kernel_parity.py)")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
