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


def test_concurrent_processes(tmp_path):
    # real concurrent processes over a shared directory: the coordinator
    # must block on the shard barrier until every worker finishes
    import subprocess
    import sys

    pairs = list(generate.generate_pairs(9, 120, error=0.1, seed=78))
    seq = str(tmp_path / "in.seq")
    seqio.write_seq_pairs(seq, pairs)
    out = str(tmp_path / "out.tsv")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = (
        "import sys, jax; jax.config.update('jax_platforms', 'cpu');"
        "sys.path.insert(0, {repo!r});"
        "from quicked_tpu.parallel.distributed import distributed_align;"
        "from quicked_tpu.params import QuickedParams, QuickedAlgo;"
        "distributed_align({seq!r}, {out!r}, "
        "QuickedParams(algo=QuickedAlgo.BANDED, bandwidth=30), "
        "process_index=int(sys.argv[1]), process_count=3)"
    ).format(repo=repo, seq=seq, out=out)
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=os.path.join(repo, ".jax_cache"),
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1")
    procs = [subprocess.Popen([sys.executable, "-c", script, str(pi)],
                              env=env, cwd=repo,
                              stdout=subprocess.DEVNULL,
                              stderr=subprocess.DEVNULL)
             for pi in range(3)]
    for p in procs:
        assert p.wait(timeout=300) == 0
    with open(out) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == 9
    for line in lines:
        assert "ERROR" not in line
