"""Parameter-sweep byte parity vs the C reference: non-default
bandwidths, window geometries and error rates (the reference's scalar
kernels are the comparison baseline — see test_edge_cases.py)."""

import os
import subprocess
import sys

import pytest

from quicked_tpu import generate, seqio

from . import oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "tools", "align_benchmark")

SWEEP = [
    ("edit-banded", ["--bandwidth", "5"], 200, 0.02),
    ("edit-banded", ["--bandwidth", "50"], 150, 0.25),
    ("edit-windowed", ["--window-size", "3", "--overlap-size", "1",
                       "--force-scalar"], 300, 0.1),
    ("edit-windowed", ["--window-size", "5", "--overlap-size", "2",
                       "--force-scalar"], 250, 0.12),
    ("edit-windowed", ["--window-size", "9", "--overlap-size", "3",
                       "--force-scalar"], 400, 0.08),
    ("edit-banded-hirschberg", ["--bandwidth", "40"], 350, 0.2),
    ("quicked", ["--window-size", "7", "--overlap-size", "2"], 300, 0.1),
    ("quicked", ["--hew-threshold", "20", "--hew-percentage", "5"],
     250, 0.15),
    ("quicked", ["--bandwidth", "30"], 200, 0.2),
]


@pytest.mark.parametrize("algo,extra,length,error", SWEEP,
                         ids=[f"{i}-{s[0]}" for i, s in enumerate(SWEEP)])
def test_param_sweep_parity(algo, extra, length, error, tmp_path):
    if oracle.oracle_path("align_benchmark") is None:
        pytest.skip("C reference oracle unavailable")
    pairs = list(generate.generate_pairs(6, length, error=error,
                                         seed=hash((algo, length)) % 1000))
    seq = str(tmp_path / "in.seq")
    seqio.write_seq_pairs(seq, pairs)
    ours = str(tmp_path / "ours.tsv")
    ref = str(tmp_path / "ref.tsv")
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"),
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1")
    r = subprocess.run(
        [sys.executable, CLI, "-a", algo, "-i", seq, "-o", ours,
         "--platform", "cpu", "-q", *extra],
        capture_output=True, text=True, timeout=560, env=env)
    assert r.returncode == 0, r.stderr[-1500:]
    subprocess.run(
        [oracle.oracle_path("align_benchmark"), "-a", algo, "-i", seq,
         "-o", ref, "-q", *extra],
        check=True, capture_output=True, timeout=300)
    with open(ours) as f1, open(ref) as f2:
        assert f1.read() == f2.read()
