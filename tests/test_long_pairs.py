"""Long-pair randomized byte parity vs the C reference (slow regime:
tests/CMakeLists.txt:23-29 at reduced counts). Run with --run-slow."""

import os
import subprocess
import sys

import pytest

from quicked_tpu import generate, seqio

from . import oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "tools", "align_benchmark")


@pytest.mark.slow
@pytest.mark.parametrize("length,n,error", [
    (10_000, 4, 0.10),
    (100_000, 2, 0.10),
    # the reference's own CI long regime (tests/random_test.sh:60-63:
    # L=1 Mbp x 10 @ 10%), at reduced count like the rows above
    (1_000_000, 2, 0.10),
])
def test_long_pair_cli_parity(length, n, error, tmp_path):
    if oracle.oracle_path("align_benchmark") is None:
        pytest.skip("C reference oracle unavailable")
    seq = str(tmp_path / "long.seq")
    pairs = list(generate.generate_pairs(n, length, error=error,
                                         seed=length))
    seqio.write_seq_pairs(seq, pairs)
    ours = str(tmp_path / "ours.tsv")
    ref = str(tmp_path / "ref.tsv")
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"),
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1")
    r = subprocess.run(
        [sys.executable, CLI, "-a", "quicked", "-i", seq, "-o", ours,
         "--platform", "cpu", "-q"],
        capture_output=True, text=True, timeout=1500, env=env)
    assert r.returncode == 0, r.stderr[-1500:]
    subprocess.run(
        [oracle.oracle_path("align_benchmark"), "-a", "quicked", "-i", seq,
         "-o", ref, "-q"],
        check=True, capture_output=True, timeout=600)
    with open(ours) as f1, open(ref) as f2:
        assert f1.read() == f2.read()
