"""C++ binding: compile against the native runtime, run, check parity.

The binding (bindings/cpp/quicked.hpp) wraps qh_align — reference
surface parity with bindings/cpp/quicked.hpp:47-69.
"""

import shutil
import subprocess
import sys
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


def _build(tmp_path, example):
    exe = tmp_path / "app"
    obj = tmp_path / "quicked_host.o"
    subprocess.run(
        ["gcc", "-O2", "-c", "-o", str(obj),
         os.path.join(REPO, "quicked_tpu", "native", "src",
                      "quicked_host.c")],
        check=True, capture_output=True)
    subprocess.run(
        ["g++", "-O2", "-o", str(exe),
         os.path.join(REPO, "examples", "bindings", example),
         os.path.join(REPO, "bindings", "cpp", "quicked.cpp"),
         str(obj), "-pthread"],
        check=True, capture_output=True)
    return exe


def test_cpp_binding_basic(tmp_path):
    exe = _build(tmp_path, "basic.cpp")
    out = subprocess.run([str(exe)], check=True, capture_output=True,
                         text=True).stdout
    assert "Score: 2" in out
    # parity with the Python API on the same pair
    from quicked_tpu.api import QuickedAligner

    a = QuickedAligner()
    a.align("ACGTACGTACGTACGT", "ACGTACGTACGATCGT")
    assert f"Score: {a.score}" in out
    assert f"CIGAR: {a.cigar}" in out


def test_cpp_binding_params(tmp_path):
    exe = _build(tmp_path, "params.cpp")
    out = subprocess.run([str(exe)], check=True, capture_output=True,
                         text=True).stdout
    assert "BANDED score: 2" in out
    assert "empty: ERROR: Tried to align an empty sequence" in out


REFERENCE = "/root/reference"


@pytest.mark.parametrize("example", ["basic.cpp", "params.cpp"])
def test_cpp_binding_reference_examples_compile_and_run(tmp_path, example):
    # Drop-in source compatibility: the REFERENCE's own binding
    # examples (align(&pattern, &text), quicked::BANDED, ...) must
    # compile unmodified against this header and run correctly.
    src = os.path.join(REFERENCE, "examples", "bindings", example)
    if not os.path.exists(src):
        pytest.skip("reference tree not mounted")
    obj = tmp_path / "quicked_host.o"
    exe = tmp_path / "app"
    subprocess.run(
        ["gcc", "-O2", "-c", "-o", str(obj),
         os.path.join(REPO, "quicked_tpu", "native", "src",
                      "quicked_host.c")],
        check=True, capture_output=True)
    subprocess.run(
        ["g++", "-O2", "-I", os.path.join(REPO, "bindings", "cpp"),
         "-o", str(exe), src,
         os.path.join(REPO, "bindings", "cpp", "quicked.cpp"),
         str(obj), "-pthread"],
        check=True, capture_output=True)
    out = subprocess.run([str(exe)], check=True, capture_output=True,
                         text=True).stdout
    if example == "basic.cpp":
        # ACGT vs ACTT: one mismatch
        assert "Score: 1" in out
    else:
        assert "Score" in out or "score" in out
