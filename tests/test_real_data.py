"""Real-data regime: the bundled ONT MinION pair (>=500 kbp, ~7.4%
error; tests/test_data/README.md:1-7) — byte parity vs the C reference
through the full QuickEd cascade. Slow: run with --run-slow."""

import os
import subprocess
import tempfile

import pytest

from quicked_tpu import seqio
from quicked_tpu.aligner.cascade import quicked_cascade_batch
from quicked_tpu.params import QuickedStatus

from . import oracle

ONT = "/root/reference/tests/test_data/ONT.MiniION.1.seq"


@pytest.mark.slow
def test_ont_minion_parity():
    if not os.path.exists(ONT):
        pytest.skip("ONT test data unavailable")
    bench = oracle.oracle_path("align_benchmark")
    if bench is None:
        pytest.skip("C reference oracle unavailable")
    pairs = list(seqio.read_seq_pairs(ONT))
    assert len(pairs) == 1
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "ref.tsv")
        subprocess.run([bench, "-a", "quicked", "-i", ONT, "-o", out, "-q"],
                       check=True, capture_output=True, timeout=600)
        with open(out) as f:
            ref_score, ref_cigar = f.read().strip().split("\t")
    res = quicked_cascade_batch(pairs)
    assert res.status[0] == QuickedStatus.QUICKED_WIP
    assert int(res.score[0]) == int(ref_score)
    assert res.cigar[0] == ref_cigar
