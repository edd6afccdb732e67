"""End-to-end tests of the batch-first engine (device kernels): parity
with the exact numpy semantic model — and therefore with the C reference,
via test_myers_np.py's byte-parity tests."""

import numpy as np
import pytest

from quicked_tpu import generate
from quicked_tpu.aligner import hirschberg as hb
from quicked_tpu.aligner.batch import align_batch_full, banded_align_batch
from quicked_tpu.aligner.cascade import quicked_cascade_batch
from quicked_tpu.cigar import Cigar
from quicked_tpu.ops import myers_np
from quicked_tpu.params import QuickedAlgo, QuickedParams, QuickedStatus


def _pairs(n, length, error, seed, length_diff=1.0):
    return list(generate.generate_pairs(n, length, error=error, seed=seed,
                                        length_diff=length_diff))


def test_banded_batch_cigar_parity():
    pairs = _pairs(4, 200, 0.1, 1) + _pairs(3, 400, 0.15, 2, 1.2)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [max(len(p), len(t)) * 25 // 100 for p, t in pairs]
    scores, ops = banded_align_batch(pats, txts, cutoffs, only_score=False)
    for i, (p, t) in enumerate(pairs):
        ms, mo = myers_np.banded_align(p, t, cutoffs[i])
        assert scores[i] == ms
        assert ops[i] == mo


def test_hirschberg_batch_parity(monkeypatch):
    # Shrink the base-case budget to force real splits on small inputs;
    # cutoffs are tight bounds, as the QuickEd cascade produces.
    monkeypatch.setattr(hb, "HIRSCHBERG_BUFFER_SIZE", 4096)
    monkeypatch.setattr(myers_np, "HIRSCHBERG_BUFFER", 4096)
    pairs = _pairs(4, 400, 0.1, 11) + _pairs(2, 600, 0.12, 12)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    from quicked_tpu.ops import edit_dp
    cutoffs = [edit_dp.edit_distance(p, t) + 16 for p, t in pairs]
    res = hb.hirschberg_batch(txts, pats, cutoffs)
    for i, (p, t) in enumerate(pairs):
        mstatus, mops = myers_np.hirschberg(t, p, cutoffs[i])
        st, ops = res[i]
        assert st == mstatus
        if st == QuickedStatus.QUICKED_OK:
            assert ops == mops, (i, p, t)


@pytest.mark.parametrize("length,error,seed", [
    (200, 0.05, 21), (300, 0.1, 22), (250, 0.2, 23),
])
def test_quicked_cascade_batch_parity(length, error, seed):
    pairs = _pairs(6, length, error, seed)
    res = quicked_cascade_batch(pairs)
    for i, (p, t) in enumerate(pairs):
        _, mops = myers_np.quicked_align(p, t)
        # run_quicked ignores the stage-4 status and returns WIP
        # (quicked.c:290-305); the model returns the internal status
        assert int(res.status[i]) == int(QuickedStatus.QUICKED_WIP)
        c = Cigar(operations=mops)
        assert res.score[i] == c.score_edit()
        assert res.cigar[i] == c.sprint(True)


def test_align_batch_full_quicked():
    pairs = _pairs(5, 150, 0.1, 31)
    res = align_batch_full(pairs, QuickedParams(algo=QuickedAlgo.QUICKED))
    for i, (p, t) in enumerate(pairs):
        _, mops = myers_np.quicked_align(p, t)
        assert res.cigar[i] == Cigar(operations=mops).sprint(True)
        assert res.score[i] == Cigar(operations=mops).score_edit()


def test_align_batch_empty_sequences():
    res = align_batch_full([("", "ACGT"), ("ACGT", "ACGT")],
                           QuickedParams(algo=QuickedAlgo.QUICKED))
    assert res.status[0] == QuickedStatus.QUICKED_EMPTY_SEQUENCE
    assert res.status[1] == QuickedStatus.QUICKED_WIP
    assert res.score[1] == 0


def test_native_cascade_deferred_hirschberg(monkeypatch):
    """Native-lane pairs whose stage-4 footprint exceeds the Hirschberg
    budget come back with a proven bound and finish through the batched
    driver — shrink the budget so small pairs exercise that path."""
    import quicked_tpu.params as params_mod
    from quicked_tpu.aligner.cascade import _cascade_staged, quicked_cascade_batch
    from quicked_tpu.utils.profiler import PhaseTimers

    monkeypatch.setattr(params_mod, "HIRSCHBERG_BUFFER_SIZE", 1 << 14)
    monkeypatch.setattr(myers_np, "HIRSCHBERG_BUFFER", 1 << 14)
    import quicked_tpu.aligner.hirschberg as hmod
    monkeypatch.setattr(hmod, "HIRSCHBERG_BUFFER_SIZE", 1 << 14)

    pairs = _pairs(4, 900, 0.15, 77)
    res = quicked_cascade_batch(pairs, QuickedParams())
    staged = _cascade_staged(pairs, QuickedParams(), PhaseTimers())
    for i in range(len(pairs)):
        assert res.score[i] == staged.score[i]
        assert res.cigar[i] == staged.cigar[i]


def test_band_trial_output_parity(monkeypatch):
    """The stage-3 narrow-band trial (qh_quicked_one / _cascade_staged)
    must be output-invisible: trial-on and trial-off runs produce
    identical scores and CIGARs on noisy corpora where stage 3 engages
    (the accept test score <= cutoff certifies exactness)."""
    from quicked_tpu.aligner.cascade import (_cascade_staged,
                                             quicked_cascade_batch)
    from quicked_tpu.utils.profiler import PhaseTimers

    # the trial engages only for CAP-LIMITED pairs (windowed bound >
    # bandwidth cap) with cut >= 4096: 50 kbp @ 25% error is
    # cap-limited with true > cut (trial misses into the telescoping
    # path), the large-indel pair is cap-limited with a loose bound,
    # and the short noisy pairs pin the skip path
    from quicked_tpu import generate

    pairs = (_pairs(12, 3000, 0.22, 31)
             + list(generate.generate_pairs(2, 50000, error=0.25,
                                            seed=41))
             + list(generate.generate_pairs(1, 150000, error=0.03,
                                            indels_num=1,
                                            indels_length=15000, seed=5))
             + _pairs(8, 1500, 0.30, 33))
    assert any(max(len(p), len(t)) * 15 // 100 >= 4096 for p, t in pairs)

    monkeypatch.delenv("QUICKED_TPU_NO_BAND_TRIAL", raising=False)
    on = quicked_cascade_batch(pairs, QuickedParams())
    on_staged = _cascade_staged(pairs, QuickedParams(), PhaseTimers())
    monkeypatch.setenv("QUICKED_TPU_NO_BAND_TRIAL", "1")
    off = quicked_cascade_batch(pairs, QuickedParams())
    off_staged = _cascade_staged(pairs, QuickedParams(), PhaseTimers())
    for i in range(len(pairs)):
        assert on.score[i] == off.score[i], i
        assert on.cigar[i] == off.cigar[i], i
        assert on_staged.score[i] == off_staged.score[i], i
        assert on_staged.cigar[i] == off_staged.cigar[i], i
        assert on.score[i] == on_staged.score[i], i
