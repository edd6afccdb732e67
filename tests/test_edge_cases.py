"""Edge-case byte parity vs the C reference: degenerate sequence shapes
through every algorithm (the places parity bugs hide)."""

import os
import subprocess
import sys
import tempfile

import pytest

from quicked_tpu import seqio

from . import oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "tools", "align_benchmark")

EDGE_PAIRS = [
    ("A", "A"),                      # single char, equal
    ("A", "T"),                      # single char, mismatch
    ("A", "ACGTACGTACGT"),           # tiny pattern vs longer text
    ("ACGTACGTACGT", "A"),           # tiny text
    ("ACGT" * 16, "ACGT" * 16),      # exactly one 64-block, identical
    ("ACGT" * 16 + "A", "ACGT" * 16),   # 65 vs 64
    ("N" * 40, "N" * 40),            # all-N (encodes to 4, matches)
    ("ACGT" * 8, "TGCA" * 8),        # heavy mismatch
    ("acgtACGT" * 4, "ACGTacgt" * 4),   # case insensitivity
    ("GATTACA" * 30, "GATTACA" * 30 + "TTT"),  # trailing indel
    ("A" * 200, "A" * 100),          # long deletion run
    ("A" * 100, "A" * 200),          # long insertion run
    # DISTINCT non-ACGT chars: both encode to 4 but the traceback's
    # M-vs-X test compares RAW chars (R vs K must emit X, not M) —
    # covers the raw-bytes plumbing through the pre-encoded Hirschberg
    # driver and every traceback venue
    ("ACGTR" * 40, "ACGTK" * 40),
    ("ACGTRRRR" * 30, "ACGTKKKK" * 30),
    ("NRKX" * 50, "NKRY" * 50),
]

# edit-windowed: the reference's SSE4.1 window kernel (default build)
# disagrees with its own scalar kernel on degenerate windows (verified:
# --force-scalar output differs from the SIMD output for pairs 2 and 5);
# we implement the scalar semantics, so compare scalar-vs-scalar.
ALGOS = [
    ("quicked", []),
    ("edit-banded", ["--bandwidth", "60"]),
    ("edit-windowed", ["--window-size", "2", "--overlap-size", "1",
                       "--force-scalar"]),
    ("edit-banded-hirschberg", ["--bandwidth", "60"]),
    ("edit-bpm", []),
    ("edit-dp", []),
]

# pair 2 ("A" vs 12-char text) crashes the reference's edit-bpm
# ("[CIGAR] Computing CIGAR score: Unknown operation"), an upstream bug
# in its full-matrix oracle on tiny patterns — skip it there.
SKIP_PAIRS = {"edit-bpm": {2}}


@pytest.fixture(scope="module")
def edge_seq(tmp_path_factory):
    td = tmp_path_factory.mktemp("edge")
    path = str(td / "edge.seq")
    seqio.write_seq_pairs(path, EDGE_PAIRS)
    return path


@pytest.mark.parametrize("algo,extra", ALGOS, ids=[a for a, _ in ALGOS])
def test_edge_parity(edge_seq, algo, extra, tmp_path):
    if oracle.oracle_path("align_benchmark") is None:
        pytest.skip("C reference oracle unavailable")
    pairs = EDGE_PAIRS
    skip = SKIP_PAIRS.get(algo, set())
    if skip:
        pairs = [p for i, p in enumerate(EDGE_PAIRS) if i not in skip]
        edge_seq = str(tmp_path / "filtered.seq")
        seqio.write_seq_pairs(edge_seq, pairs)
    ours = str(tmp_path / "ours.tsv")
    ref = str(tmp_path / "ref.tsv")
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"),
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1")
    r = subprocess.run(
        [sys.executable, CLI, "-a", algo, "-i", edge_seq, "-o", ours,
         "--platform", "cpu", "-q", *extra],
        capture_output=True, text=True, timeout=560, env=env)
    assert r.returncode == 0, r.stderr[-1500:]
    subprocess.run(
        [oracle.oracle_path("align_benchmark"), "-a", algo, "-i", edge_seq,
         "-o", ref, "-q", *extra],
        check=True, capture_output=True, timeout=300)
    with open(ours) as f1, open(ref) as f2:
        ours_lines = f1.read().splitlines()
        ref_lines = f2.read().splitlines()
    assert len(ours_lines) == len(ref_lines)
    for i, (a, b) in enumerate(zip(ours_lines, ref_lines)):
        assert a == b, (algo, i, pairs[i], a, b)
