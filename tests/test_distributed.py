"""Distributed driver tests: shard equivalence — N simulated processes
over the same input produce the identical ordered output as 1 process."""

import os

import numpy as np

from quicked_tpu import generate, seqio
from quicked_tpu.parallel.distributed import distributed_align
from quicked_tpu.params import QuickedAlgo, QuickedParams


def test_shard_equivalence(tmp_path):
    pairs = list(generate.generate_pairs(12, 150, error=0.1, seed=77))
    seq = str(tmp_path / "in.seq")
    seqio.write_seq_pairs(seq, pairs)
    params = QuickedParams(algo=QuickedAlgo.BANDED, bandwidth=30)

    out1 = str(tmp_path / "out1.tsv")
    n = distributed_align(seq, out1, params, process_index=0,
                         process_count=1)
    assert n == 12

    # simulate 3 processes sequentially over the same shared directory
    # (coordinator last, so its merge sees every shard)
    out3 = str(tmp_path / "out3.tsv")
    total = 0
    for pi in (1, 2, 0):
        total += distributed_align(seq, out3, params, process_index=pi,
                                   process_count=3)
    assert total == 12
    with open(out1) as f1, open(out3) as f3:
        assert f1.read() == f3.read()
