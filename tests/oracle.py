"""Locate (or build) the C reference binaries used as the parity oracle.

The reference source is mounted read-only at /root/reference; we build it
into .oracle/ inside this repo (never writing to the reference tree) and
cache the binaries there.
"""

from __future__ import annotations

import os
import shutil
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_BIN = os.path.join(REPO, ".oracle", "bin")
REFERENCE = "/root/reference"


_build_failed = False    # memoize: one cmake attempt per process


def _build() -> bool:
    global _build_failed
    if _build_failed or not os.path.isdir(REFERENCE):
        return False
    src = os.path.join(REPO, ".oracle", "src")
    build = os.path.join(REPO, ".oracle", "build2")
    try:
        if not os.path.isdir(src):
            # copy to a temp dir + atomic rename: an interrupted copy
            # must not leave a partial tree that poisons every later
            # build (isdir(src) would skip the re-copy forever)
            tmp = src + f".tmp{os.getpid()}"
            try:
                shutil.copytree(REFERENCE, tmp)
                try:
                    os.replace(tmp, src)
                except OSError:
                    if not os.path.isdir(src):   # concurrent builder won
                        raise
                    shutil.rmtree(tmp, ignore_errors=True)
            except BaseException:
                shutil.rmtree(tmp, ignore_errors=True)
                raise
        subprocess.run(["cmake", "-S", src, "-B", build,
                        "-DCMAKE_BUILD_TYPE=Release"],
                       check=True, capture_output=True)
        subprocess.run(["cmake", "--build", build, "-j", "4"],
                       check=True, capture_output=True)
        os.makedirs(ORACLE_BIN, exist_ok=True)
        for name in ("align_benchmark", "generate_dataset", "quicked_harness"):
            p = os.path.join(src, "bin", name)
            if os.path.exists(p):
                shutil.copy2(p, os.path.join(ORACLE_BIN, name))
        return True
    except (subprocess.CalledProcessError, OSError):
        _build_failed = True    # don't re-run cmake for every test
        return False


def oracle_path(name: str) -> str | None:
    """Path to an oracle binary ('align_benchmark', 'quicked_harness',
    'generate_dataset'), building on first use; None if unavailable."""
    p = os.path.join(ORACLE_BIN, name)
    if os.path.exists(p):
        return p
    if _build():
        p = os.path.join(ORACLE_BIN, name)
        if os.path.exists(p):
            return p
    return None


def edlib_oracle_path() -> str | None:
    """Path to the edlib_oracle shim (tools/oracle_src/edlib_oracle.cpp
    built against the reference's vendored edlib), building on first
    use; None if unavailable."""
    p = os.path.join(ORACLE_BIN, "edlib_oracle")
    if os.path.exists(p):
        return p
    if oracle_path("align_benchmark") is None:   # ensures the build tree
        return None
    src = os.path.join(REPO, "tools", "oracle_src", "edlib_oracle.cpp")
    inc = os.path.join(REPO, ".oracle", "src", "tools", "align_benchmark",
                       "external", "edlib", "edlib", "include")
    lib = os.path.join(REPO, ".oracle", "build2", "lib", "libedlib.a")
    if not (os.path.exists(src) and os.path.exists(inc)
            and os.path.exists(lib)):
        return None
    try:
        os.makedirs(ORACLE_BIN, exist_ok=True)
        subprocess.run(["g++", "-O2", "-I", inc, "-o", p, src, lib],
                       check=True, capture_output=True)
        return p
    except (subprocess.CalledProcessError, OSError):
        return None


def run_align_benchmark(algorithm: str, seq_path: str, out_path: str,
                        extra_args: list[str] | None = None) -> str:
    """Run the oracle align_benchmark, return the output file contents."""
    bench = oracle_path("align_benchmark")
    assert bench is not None, "oracle align_benchmark unavailable"
    cmd = [bench, "-a", algorithm, "-i", seq_path, "-o", out_path, "-q"]
    cmd += extra_args or []
    subprocess.run(cmd, check=True, capture_output=True)
    with open(out_path) as f:
        return f.read()
