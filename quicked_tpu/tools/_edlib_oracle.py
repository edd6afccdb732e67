"""edlib ground-truth oracle access for the benchmark CLI.

The reference vendors edlib in-process as its `--check` oracle and its
`-a edlib` comparison algorithm (benchmark_check.c:117-158,
benchmark_edit.c:339-372). Here the equivalent is an out-of-process
shim (tools/oracle_src/edlib_oracle.cpp) built against the reference's
vendored edlib by the oracle build; when it is absent (no reference
checkout / no C++ toolchain) callers fall back to the repo's exact-DP
oracle for scores.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def find_edlib_oracle() -> str | None:
    p = os.path.join(_REPO, ".oracle", "bin", "edlib_oracle")
    if os.path.exists(p):
        return p
    try:
        if _REPO not in sys.path:
            sys.path.insert(0, _REPO)
        from tests import oracle

        return oracle.edlib_oracle_path()
    except Exception:
        return None


def edlib_batch(pairs, bandwidth: int = -1):
    """Align a batch with edlib; returns list[(score, rle_cigar)] in
    input order, or None when the oracle is unavailable."""
    exe = find_edlib_oracle()
    if not exe:
        return None
    from quicked_tpu import seqio

    with tempfile.TemporaryDirectory() as td:
        seq = os.path.join(td, "in.seq")
        seqio.write_seq_pairs(seq, pairs)
        try:
            out = subprocess.run([exe, seq, str(bandwidth)],
                                 check=True, capture_output=True,
                                 text=True).stdout
        except subprocess.CalledProcessError:
            return None
    res = []
    for line in out.splitlines():
        score_s, cigar = line.split("\t", 1)
        res.append((int(score_s), cigar))
    if len(res) != len(pairs):
        return None
    return res
