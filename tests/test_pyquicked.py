"""pyquicked drop-in shim parity.

The reference ships a pybind11 module named ``pyquicked``
(bindings/python/quicked.cpp:30-66) and an example that imports it
(examples/bindings/basic.py). The shim (repo-root pyquicked.py) must
give the same surface — including running the reference's own example
file unmodified.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_EXAMPLE = "/root/reference/examples/bindings/basic.py"


def test_surface():
    import pyquicked

    a = pyquicked.QuickedAligner()
    a.setAlgorithm(pyquicked.BANDED)
    a.setBandwidth(10)
    a.align("ACGT", "ACTT")
    assert a.getScore() == 1
    assert a.getCigar() == "2M1X1M"
    assert pyquicked.QUICKED_OK == pyquicked.QuickedStatus.QUICKED_OK
    assert issubclass(pyquicked.QuickedException, Exception)


@pytest.mark.parametrize("example", [
    REF_EXAMPLE,
    os.path.join(REPO, "examples", "bindings", "basic.py"),
], ids=["reference-verbatim", "repo"])
def test_binding_example_runs(example):
    if not os.path.exists(example):
        pytest.skip("example unavailable")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO,
               JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"),
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1")
    runner = os.path.join(REPO, "tests", "_run_example.py")
    r = subprocess.run([sys.executable, runner, example],
                       capture_output=True, text=True, timeout=300,
                       env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Score: 1" in r.stdout
    assert "Cigar: 2M1X1M" in r.stdout
