"""Parity tests: the exact numpy semantic model vs the edit-DP oracle and
the compiled C reference (byte-identical scores and CIGARs)."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from quicked_tpu import dna, generate, seqio
from quicked_tpu.cigar import Cigar
from quicked_tpu.ops import edit_dp, myers_np
from quicked_tpu.params import QuickedStatus

from . import oracle


def _pairs(n, length, error, seed, length_diff=1.0):
    return list(generate.generate_pairs(n, length, error=error, seed=seed,
                                        length_diff=length_diff))


# ---------------------------------------------------------------------------
# edit_dp self-check
# ---------------------------------------------------------------------------

def test_edit_dp_small():
    assert edit_dp.edit_distance("GATC", "GATC") == 0
    assert edit_dp.edit_distance("GATC", "GATO") == 1  # O->N mismatch
    assert edit_dp.edit_distance("AAAA", "AA") == 2
    assert edit_dp.edit_distance("", "ACGT") == 4
    D = edit_dp.edit_dp_matrix("GATTACA", "GCATGCU")
    assert D[-1, -1] == 4


# ---------------------------------------------------------------------------
# banded model vs DP oracle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("length,error,seed", [
    (64, 0.05, 0), (100, 0.1, 1), (200, 0.1, 2), (300, 0.15, 3),
    (129, 0.1, 4), (65, 0.3, 5),
])
def test_banded_score_vs_dp(length, error, seed):
    for pat, text in _pairs(4, length, error, seed):
        true = edit_dp.edit_distance(pat, text)
        cutoff = max(len(pat), len(text)) * 40 // 100
        score, _ = myers_np.banded_align(pat, text, cutoff, only_score=True)
        assert score == true, (pat, text)


@pytest.mark.parametrize("length,error,seed,ldiff", [
    (100, 0.1, 10, 1.0), (200, 0.05, 11, 1.2), (150, 0.1, 12, 0.8),
])
def test_banded_cigar_valid(length, error, seed, ldiff):
    for pat, text in _pairs(4, length, error, seed, length_diff=ldiff):
        true = edit_dp.edit_distance(pat, text)
        cutoff = max(len(pat), len(text)) * 40 // 100
        score, ops = myers_np.banded_align(pat, text, cutoff)
        c = Cigar(operations=ops)
        assert c.score_edit() == true
        assert c.check_alignment(pat, text)


def test_banded_narrow_band_overestimates():
    # With a band too narrow for the true distance, the banded score is an
    # upper bound (possibly "inaccurate", like the reference).
    pat = "A" * 200
    text = "T" * 200
    score, _ = myers_np.banded_align(pat, text, 65, only_score=True)
    assert score >= 200 or score >= 65


# ---------------------------------------------------------------------------
# windowed model: exact scores on easy pairs, upper bound in general
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ws,ovl", [(2, 1), (9, 1), (3, 2)])
def test_windowed_score_bounds(ws, ovl):
    for pat, text in _pairs(6, 150, 0.05, 21):
        true = edit_dp.edit_distance(pat, text)
        score, _, hew = myers_np.windowed_compute(pat, text, 40, ws, ovl, True)
        assert score >= true
        if true == 0:
            assert score == 0


def test_windowed_cigar_valid():
    for pat, text in _pairs(5, 120, 0.08, 22):
        _, ops, _ = myers_np.windowed_compute(pat, text, 40, 2, 1, False)
        c = Cigar(operations=ops)
        assert c.check_alignment(pat, text)
        assert c.score_edit() >= edit_dp.edit_distance(pat, text)


# ---------------------------------------------------------------------------
# hirschberg + quicked cascade vs DP oracle
# ---------------------------------------------------------------------------

def test_hirschberg_base_case():
    for pat, text in _pairs(4, 150, 0.1, 31):
        true = edit_dp.edit_distance(pat, text)
        status, ops = myers_np.hirschberg(text, pat, max(len(pat), len(text)))
        assert status == QuickedStatus.QUICKED_OK
        c = Cigar(operations=ops)
        assert c.score_edit() == true
        assert c.check_alignment(pat, text)


def test_hirschberg_recursion(monkeypatch):
    # Shrink the base-case budget to force recursive splitting on small
    # inputs; scores must stay exact and alignments valid.
    monkeypatch.setattr(myers_np, "HIRSCHBERG_BUFFER", 4096)
    for pat, text in _pairs(4, 300, 0.1, 32):
        true = edit_dp.edit_distance(pat, text)
        status, ops = myers_np.hirschberg(text, pat, true + 16)
        assert status == QuickedStatus.QUICKED_OK
        c = Cigar(operations=ops)
        assert c.score_edit() == true, (pat, text)
        assert c.check_alignment(pat, text)


def test_quicked_cascade():
    for pat, text in _pairs(6, 200, 0.1, 33):
        true = edit_dp.edit_distance(pat, text)
        status, ops = myers_np.quicked_align(pat, text)
        c = Cigar(operations=ops)
        assert c.score_edit() == true
        assert c.check_alignment(pat, text)


def test_quicked_nonDNA():
    # tests/CMakeLists.txt:13 — GATC vs GATO scores 1 (O encodes to N).
    status, ops = myers_np.quicked_align("GATC", "GATO")
    assert Cigar(operations=ops).score_edit() == 1


# ---------------------------------------------------------------------------
# byte parity vs the C reference binaries
# ---------------------------------------------------------------------------

def _oracle_lines(algorithm, pairs, extra=None):
    if oracle.oracle_path("align_benchmark") is None:
        pytest.skip("C reference oracle unavailable")
    with tempfile.TemporaryDirectory() as td:
        seq = os.path.join(td, "in.seq")
        out = os.path.join(td, "out.tsv")
        seqio.write_seq_pairs(seq, pairs)
        data = oracle.run_align_benchmark(algorithm, seq, out, extra)
    return data.strip("\n").split("\n")


@pytest.mark.parametrize("length,error,seed,ldiff", [
    (100, 0.1, 41, 1.0), (200, 0.15, 42, 1.0), (150, 0.1, 43, 1.25),
    (300, 0.05, 44, 0.8), (64, 0.2, 45, 1.0), (500, 0.1, 46, 1.0),
])
def test_parity_banded_vs_reference(length, error, seed, ldiff):
    pairs = _pairs(6, length, error, seed, length_diff=ldiff)
    lines = _oracle_lines("edit-banded", pairs, ["--bandwidth", "15"])
    for (pat, text), line in zip(pairs, lines):
        ref_score, ref_cigar = line.split("\t")
        cutoff = max(len(pat), len(text)) * 15 // 100
        score, ops = myers_np.banded_align(pat, text, cutoff)
        c = Cigar(operations=ops)
        assert c.score_edit() == int(ref_score), (pat, text)
        assert c.sprint(True) == ref_cigar, (pat, text)


@pytest.mark.parametrize("length,error,seed", [
    (100, 0.1, 51), (250, 0.1, 52), (150, 0.2, 53),
])
def test_parity_windowed_vs_reference(length, error, seed):
    pairs = _pairs(6, length, error, seed)
    lines = _oracle_lines("edit-windowed", pairs,
                          ["--window-size", "9", "--overlap-size", "1"])
    for (pat, text), line in zip(pairs, lines):
        ref_score, ref_cigar = line.split("\t")
        _, ops, _ = myers_np.windowed_compute(pat, text, 0, 9, 1, False)
        c = Cigar(operations=ops)
        assert c.score_edit() == int(ref_score), (pat, text)
        assert c.sprint(True) == ref_cigar, (pat, text)


@pytest.mark.parametrize("length,error,seed", [
    (100, 0.1, 61), (200, 0.1, 62), (400, 0.15, 63), (137, 0.08, 64),
])
def test_parity_quicked_vs_reference(length, error, seed):
    pairs = _pairs(5, length, error, seed)
    lines = _oracle_lines("quicked", pairs)
    for (pat, text), line in zip(pairs, lines):
        ref_score, ref_cigar = line.split("\t")
        status, ops = myers_np.quicked_align(pat, text)
        c = Cigar(operations=ops)
        assert c.score_edit() == int(ref_score), (pat, text)
        assert c.sprint(True) == ref_cigar, (pat, text)


@pytest.mark.parametrize("length,error,seed", [
    (120, 0.1, 71), (260, 0.12, 72),
])
def test_parity_hirschberg_vs_reference(length, error, seed):
    pairs = _pairs(5, length, error, seed)
    lines = _oracle_lines("edit-banded-hirschberg", pairs,
                          ["--bandwidth", "15"])
    for (pat, text), line in zip(pairs, lines):
        ref_score, ref_cigar = line.split("\t")
        cutoff = max(len(pat), len(text)) * 15 // 100
        status, ops = myers_np.hirschberg(text, pat, cutoff)
        c = Cigar(operations=ops)
        assert c.score_edit() == int(ref_score), (pat, text)
        assert c.sprint(True) == ref_cigar, (pat, text)


@pytest.mark.slow
def test_parity_quicked_large():
    pairs = _pairs(2, 3000, 0.1, 81)
    lines = _oracle_lines("quicked", pairs)
    for (pat, text), line in zip(pairs, lines):
        ref_score, ref_cigar = line.split("\t")
        status, ops = myers_np.quicked_align(pat, text)
        c = Cigar(operations=ops)
        assert c.score_edit() == int(ref_score)
        assert c.sprint(True) == ref_cigar
