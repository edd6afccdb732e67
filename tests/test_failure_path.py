"""Non-convergence failure-path parity (QUICKED_FAIL_NON_CONVERGENCE).

Reference semantics under test (bpm_hirschberg.c:210-243, quicked.c):
  - the recursion solves the right half first into a shared right-to-left
    buffer, so on failure the buffer holds every leaf right of the
    DFS-first failing node (usually empty: top-level failure);
  - run_hirschberg reports the error status but still extracts the
    partial CIGAR + its score (quicked.c:154-157);
  - run_quicked ignores the Hirschberg status entirely and returns the
    partial results as a success (quicked.c:290-305).
"""

import numpy as np
import pytest

from quicked_tpu import generate
from quicked_tpu.ops import myers_np
from quicked_tpu.params import QuickedAlgo, QuickedParams, QuickedStatus

from tests import oracle


def _nc_pair():
    """A real pair whose top-level Hirschberg split fails at bandwidth
    1 (found by band-intersection search; dense 30% noise + length
    drift leave the collapsed forward/reverse bands 8 cells apart)."""
    pairs = list(generate.generate_pairs(2, 100000, error=0.3, seed=12))
    return pairs


@pytest.mark.slow
def test_cli_non_convergence_byte_parity(tmp_path):
    """ERROR row bytes match the reference CLI on a non-convergent pair."""
    import subprocess
    import sys

    from quicked_tpu import seqio

    bench = oracle.oracle_path("align_benchmark")
    if bench is None:
        pytest.skip("oracle unavailable")
    seq = tmp_path / "nc.seq"
    seqio.write_seq_pairs(str(seq), _nc_pair())
    ref_out = tmp_path / "ref.tsv"
    our_out = tmp_path / "our.tsv"
    subprocess.run([bench, "-a", "edit-banded-hirschberg", "--bandwidth",
                    "1", "-i", str(seq), "-o", str(ref_out), "-q"],
                   check=True, capture_output=True)
    subprocess.run([sys.executable, "tools/align_benchmark", "-a",
                    "edit-banded-hirschberg", "--bandwidth", "1", "-i",
                    str(seq), "-o", str(our_out), "-q", "--platform",
                    "cpu"], check=True, capture_output=True)
    ref = ref_out.read_text()
    assert ref.startswith("ERROR\tERROR\n")   # pair 0 fails upstream too
    assert our_out.read_text() == ref


def test_hirschberg_batch_top_level_failure_empty_partial():
    """Top-level failure: status -2, empty partial, and the HIRSCHBERG
    API still extracts (score 0, no cigar) like extract_results."""
    from quicked_tpu.aligner.batch import align_batch_full

    p, t = _nc_pair()[0]
    params = QuickedParams(algo=QuickedAlgo.HIRSCHBERG, bandwidth=1)
    res = align_batch_full([(p, t)], params)
    assert res.status[0] == QuickedStatus.QUICKED_FAIL_NON_CONVERGENCE
    assert res.score[0] == 0
    assert res.cigar[0] is None


def test_quicked_cascade_ignores_hirschberg_failure(monkeypatch):
    """run_quicked returns the partial results as success even when the
    final Hirschberg stage fails (quicked.c:290-305)."""
    from quicked_tpu.aligner import cascade as casc

    def failing_hirschberg(texts, patterns, cutoffs):
        return [(QuickedStatus.QUICKED_FAIL_NON_CONVERGENCE, "MMMM")
                for _ in texts]

    import quicked_tpu.aligner.hirschberg as hmod
    monkeypatch.setattr(hmod, "hirschberg_batch", failing_hirschberg)
    res = casc.quicked_cascade_batch([("ACGT", "ACGT")], QuickedParams())
    assert res.status[0] == QuickedStatus.QUICKED_WIP
    assert res.score[0] == 0
    assert res.cigar[0] == "4M"


def test_batched_driver_partial_matches_model_on_injected_failure(
        monkeypatch):
    """Deep failure: inject a split failure at one subproblem and check
    the worklist driver reproduces the model's DFS partial exactly
    (right-of-failure leaves only, left leaves discarded)."""
    from collections import Counter

    from quicked_tpu.aligner.hirschberg import hirschberg_batch

    (pat, txt), = generate.generate_pairs(1, 4269, error=0.05, seed=4)

    # Force splitting of small problems so the recursion is deep.
    monkeypatch.setattr(myers_np, "HIRSCHBERG_BUFFER", 1 << 15)
    import quicked_tpu.aligner.hirschberg as hmod
    monkeypatch.setattr(hmod, "HIRSCHBERG_BUFFER_SIZE", 1 << 15)

    # Pass 1: record every split's (plen, tlen) in DFS order.
    real_split = myers_np.hirschberg_split
    real_fast = myers_np.hirschberg_split_fast
    seen = []

    def recording(fwd, rev, plen, tlen, geo):
        seen.append((plen, tlen))
        return real_split(fwd, rev, plen, tlen, geo)

    monkeypatch.setattr(myers_np, "hirschberg_split", recording)
    st0, _ = myers_np.hirschberg(txt, pat, 65)
    assert st0 == QuickedStatus.QUICKED_OK and len(seen) >= 3

    # Target the DFS-last split that identifies a unique subproblem —
    # the leftmost deep node, so leaves exist to its right.
    counts = Counter(seen)
    target = next(s for s in reversed(seen) if counts[s] == 1)
    assert target != seen[0]

    def injected(fwd, rev, plen, tlen, geo):
        if (plen, tlen) == target:
            return None
        return real_split(fwd, rev, plen, tlen, geo)

    def injected_fast(pv, mv, first, last, sk, rpv, rmv, rfirst, rlast,
                      rsk, prolog, plen, tlen):
        if (plen, tlen) == target:
            return None
        return real_fast(pv, mv, first, last, sk, rpv, rmv, rfirst,
                         rlast, rsk, prolog, plen, tlen)

    monkeypatch.setattr(myers_np, "hirschberg_split", injected)
    monkeypatch.setattr(myers_np, "hirschberg_split_fast", injected_fast)
    st_model, ops_model = myers_np.hirschberg(txt, pat, 65)
    res = hirschberg_batch([txt], [pat], [65])
    assert int(st_model) < 0
    assert res[0][0] == st_model
    assert res[0][1] == ops_model
    assert len(ops_model) > 0   # leaves right of the failure survive
