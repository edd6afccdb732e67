"""Independent edlib oracle: `-a edlib` byte parity + --check parity."""

import subprocess
import sys

import pytest

from quicked_tpu import generate, seqio

from tests import oracle


def _need():
    bench = oracle.oracle_path("align_benchmark")
    shim = oracle.edlib_oracle_path()
    if bench is None or shim is None:
        pytest.skip("reference oracle / edlib shim unavailable")
    return bench


def _seq(tmp_path, n=30, L=250, e=0.12, seed=6):
    p = tmp_path / "in.seq"
    seqio.write_seq_pairs(str(p),
                         list(generate.generate_pairs(n, L, error=e,
                                                      seed=seed)))
    return p


def test_edlib_algorithm_byte_parity(tmp_path):
    bench = _need()
    seq = _seq(tmp_path)
    ref, our = tmp_path / "ref.tsv", tmp_path / "our.tsv"
    subprocess.run([bench, "-a", "edlib", "-i", str(seq), "-o", str(ref),
                    "-q"], check=True, capture_output=True)
    subprocess.run([sys.executable, "tools/align_benchmark", "-a", "edlib",
                    "-i", str(seq), "-o", str(our), "-q"],
                   check=True, capture_output=True)
    assert our.read_text() == ref.read_text()


def test_check_alignment_accuracy_block_byte_parity(tmp_path):
    """--check alignment [Accuracy] stderr block is byte-identical to
    the reference's (counter semantics, early exits, metric-scaled
    printer — both sides judge CIGARs against edlib's bytes)."""
    bench = _need()
    seq = _seq(tmp_path, n=20, L=200, e=0.1, seed=4)

    def accuracy_block(stderr):
        assert "[Accuracy]" in stderr
        return stderr[stderr.index("[Accuracy]"):]

    r = subprocess.run([bench, "-a", "quicked", "-i", str(seq), "-c",
                        "alignment"], check=True, capture_output=True,
                       text=True)
    o = subprocess.run([sys.executable, "tools/align_benchmark", "-a",
                        "quicked", "-i", str(seq), "-c", "alignment",
                        "--platform", "cpu"], check=True,
                       capture_output=True, text=True)
    assert accuracy_block(o.stderr) == accuracy_block(r.stderr)
