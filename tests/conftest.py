"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
and kernel (interpret-mode) tests run anywhere; TPU runs use bench.py."""

import os

# Force CPU for tests regardless of the ambient platform (the environment
# may preset JAX_PLATFORMS=axon/tpu for the real chip; bench.py uses that).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--run-slow", action="store_true", default=False,
                     help="run slow (large-input) parity tests")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow large-input parity tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip = pytest.mark.skip(reason="needs --run-slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
