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

# Persistent XLA compilation cache: the kernels are scan-heavy and cold
# compiles dominate test wall time; cache them across runs.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")


def pytest_sessionstart(session):
    import jax

    # The environment's TPU plugin (sitecustomize) hard-sets
    # jax_platforms="axon,cpu" via jax.config.update, which overrides
    # JAX_PLATFORMS from the environment — force CPU back the same way
    # so tests really run on the 8 virtual CPU devices.
    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 8, jax.devices()
    # machine-scoped subdir: entries from a previous round's machine
    # class otherwise spray cpu_aot_loader feature-mismatch errors
    from quicked_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(_CACHE)


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
