"""CLI integration tests: byte parity of align_benchmark TSV output vs
the compiled C reference across every shared algorithm, plus
generate_dataset and flag behavior."""

import os
import subprocess
import sys
import tempfile

import pytest

from quicked_tpu import generate, seqio

from . import oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "tools", "align_benchmark")

ALGOS = [
    ("quicked", []),
    ("edit-banded", ["--bandwidth", "15"]),
    ("edit-windowed", ["--window-size", "9", "--overlap-size", "1"]),
    ("edit-banded-hirschberg", ["--bandwidth", "15"]),
    ("edit-dp", []),
    ("edit-dp-banded", ["--bandwidth", "10"]),
    ("edit-bpm", []),
]


def _env():
    return dict(os.environ,
                JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"),
                JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    td = tmp_path_factory.mktemp("cli")
    seq = str(td / "in.seq")
    pairs = list(generate.generate_pairs(8, 180, error=0.1, seed=55))
    seqio.write_seq_pairs(seq, pairs)
    return seq


@pytest.mark.parametrize("algo,extra", ALGOS,
                         ids=[a for a, _ in ALGOS])
def test_cli_byte_parity(dataset, algo, extra, tmp_path):
    if oracle.oracle_path("align_benchmark") is None:
        pytest.skip("C reference oracle unavailable")
    ours = str(tmp_path / "ours.tsv")
    ref = str(tmp_path / "ref.tsv")
    r = subprocess.run(
        [sys.executable, CLI, "-a", algo, "-i", dataset, "-o", ours,
         "--platform", "cpu", "-q", *extra],
        capture_output=True, text=True, timeout=560, env=_env())
    assert r.returncode == 0, r.stderr[-1500:]
    subprocess.run(
        [oracle.oracle_path("align_benchmark"), "-a", algo, "-i", dataset,
         "-o", ref, "-q", *extra],
        check=True, capture_output=True, timeout=300)
    with open(ours) as f1, open(ref) as f2:
        assert f1.read() == f2.read()


def test_cli_output_full_parity(dataset, tmp_path):
    # 6-column --output-full format (benchmark_utils.c:151-170)
    if oracle.oracle_path("align_benchmark") is None:
        pytest.skip("C reference oracle unavailable")
    ours = str(tmp_path / "ours.tsv")
    ref = str(tmp_path / "ref.tsv")
    subprocess.run(
        [sys.executable, CLI, "-a", "edit-banded", "--bandwidth", "15",
         "-i", dataset, "--output-full", ours, "--platform", "cpu", "-q"],
        check=True, capture_output=True, timeout=560, env=_env())
    subprocess.run(
        [oracle.oracle_path("align_benchmark"), "-a", "edit-banded",
         "--bandwidth", "15", "-i", dataset, "--output-full", ref, "-q"],
        check=True, capture_output=True, timeout=300)
    with open(ours) as f1, open(ref) as f2:
        assert f1.read() == f2.read()


def test_cli_edlib(dataset):
    # with the oracle shim available, -a edlib runs (byte parity is
    # covered by test_edlib_oracle); without it, a clear error
    r = subprocess.run(
        [sys.executable, CLI, "-a", "edlib", "-i", dataset, "-q"],
        capture_output=True, text=True, timeout=300, env=_env())
    from tests import oracle
    if oracle.edlib_oracle_path() is None:
        assert r.returncode == 1
        assert "edlib" in r.stderr
    else:
        assert r.returncode == 0


def test_generate_dataset_format(tmp_path):
    out = str(tmp_path / "g.seq")
    gen = os.path.join(REPO, "tools", "generate_dataset")
    subprocess.run([sys.executable, gen, "-n", "5", "-l", "100", "-e",
                    "0.08", "--seed", "3", "-o", out],
                   check=True, capture_output=True, timeout=120)
    pairs = list(seqio.read_seq_pairs(out))
    assert len(pairs) == 5
    with open(out) as f:
        first = f.readline()
        second = f.readline()
    assert first.startswith(">") and second.startswith("<")

    # length_diff < 1: the long sequence is the pattern and line 1 is
    # marked '<' (generate_dataset.c:399-409)
    out2 = str(tmp_path / "g2.seq")
    subprocess.run([sys.executable, gen, "-n", "3", "-l", "100", "-e",
                    "0.05", "--length-diff", "0.8", "--seed", "4",
                    "-o", out2],
                   check=True, capture_output=True, timeout=120)
    with open(out2) as f:
        l1 = f.readline()
        l2 = f.readline()
    assert l1.startswith("<") and l2.startswith(">")
    assert len(l1) > len(l2)  # pattern (line 1) is the long sequence
