"""Test harness config (SURVEY.md §4).

By default tests run hermetically on CPU with 8 virtual devices (the standard
JAX trick for testing sharding without a cluster). Set FASHION_NERF_TEST_TPU=1
to run against real TPU hardware instead (kernel tests use it; they are
skipped, not faked, when no TPU is present).

This module must set env vars BEFORE jax initializes a backend, hence the
top-level os.environ writes.
"""

import os
import sys

_TEST_TPU = os.environ.get("FASHION_NERF_TEST_TPU", "0") == "1"

# Must run before the CPU backend initializes (it is lazy, so conftest import
# time is early enough even though the axon TPU plugin registers at
# interpreter start via sitecustomize and pins jax_platforms='axon,cpu').
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402
import pytest  # noqa: E402

if not _TEST_TPU:
    # The axon plugin force-selects the TPU backend regardless of
    # JAX_PLATFORMS, so pin the default *device* to CPU instead. Tests that
    # need a mesh build it from jax.devices('cpu') explicitly.
    jax.config.update("jax_default_device", jax.devices("cpu")[0])


def on_tpu() -> bool:
    return _TEST_TPU and jax.devices()[0].platform == "tpu"


def cpu_devices(n: int = 8):
    return jax.devices("cpu")[:n]


@pytest.fixture(scope="session")
def tpu_only():
    if not on_tpu():
        pytest.skip("requires a real TPU device")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "tpu" in item.keywords and not on_tpu():
            item.add_marker(pytest.mark.skip(reason="requires real TPU"))
