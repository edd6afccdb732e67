"""Harness + randomized regime tests, mirroring the reference CTest
surface (tests/CMakeLists.txt:10-29, random_test.sh)."""

import os
import subprocess
import sys

import pytest

from quicked_tpu import generate
from quicked_tpu.aligner.cascade import quicked_cascade_batch
from quicked_tpu.ops import edit_dp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS = os.path.join(REPO, "tools", "quicked_harness")


def _run(*argv):
    env = dict(os.environ, QUICKED_HARNESS_PLATFORM="cpu",
               JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"),
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1")
    return subprocess.run([sys.executable, HARNESS, *argv],
                          capture_output=True, text=True, timeout=300,
                          env=env, cwd=REPO)


def test_harness_empty():
    # tests/CMakeLists.txt:10-11 — must print the empty-sequence error
    r = _run("", "ACGT")
    assert r.returncode != 0
    assert "ERROR: Tried to align an empty sequence" in r.stderr


def test_harness_nonDNA():
    # tests/CMakeLists.txt:13 — GATC vs GATO scores 1 (O encodes to N)
    r = _run("GATC", "GATO", "1")
    assert r.returncode == 0, r.stderr
    assert "Got score: 1" in r.stdout


def test_harness_score_check_fail():
    r = _run("GATC", "GATC", "7")
    assert r.returncode != 0
    assert "<FAIL>" in r.stdout


def test_random_regime_small():
    # random_test.sh semantics at reduced scale: generated pairs must
    # align crash-free and score-accurately (checked vs the exact DP).
    pairs = list(generate.generate_pairs(20, 1000, error=0.1, seed=91))
    res = quicked_cascade_batch(pairs)
    for i, (p, t) in enumerate(pairs):
        assert int(res.status[i]) >= 0
        assert res.score[i] == edit_dp.edit_distance(p, t), (i,)


@pytest.mark.slow
def test_random_regime_100k():
    # L=100 kbp regime (tests/CMakeLists.txt:23-25), reduced count
    pairs = list(generate.generate_pairs(4, 100_000, error=0.1, seed=92))
    res = quicked_cascade_batch(pairs)
    for i in range(len(pairs)):
        assert int(res.status[i]) >= 0


def test_workload_row_schema():
    """benchmarks/run_workloads.run_workload returns the BENCH-artifact
    row shape: cold/warm wall, venue diff, throughput fields."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks"))
    import run_workloads

    row = run_workloads.run_workload(1)
    for key in ("workload", "pairs", "bases", "cold_s", "warm_s",
                "pairs_per_s", "bases_per_s", "ok", "venues"):
        assert key in row, key
    assert row["ok"] == row["pairs"] == 1
    assert isinstance(row["venues"], dict) and row["venues"]
