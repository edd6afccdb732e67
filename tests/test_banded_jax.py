"""Parity tests: the batched JAX banded kernel vs the exact numpy
semantic model (and therefore the C reference, via test_myers_np.py).

Bit-exactness contract (SURVEY.md §7): scores from run_banded must equal
myers_np.banded_score / banded_fill, and traceback over the kernel's
stored band matrix must reproduce the reference CIGAR bytes.
"""

import numpy as np
import pytest

from quicked_tpu import dna, generate
from quicked_tpu.cigar import Cigar
from quicked_tpu.ops import edit_dp, myers_np
from quicked_tpu.ops.batch_prep import prepare_banded_batch, extract_final_scores
from quicked_tpu.ops.banded_jax import run_banded
from quicked_tpu.ops.traceback_np import banded_traceback_pair


def _pairs(n, length, error, seed, length_diff=1.0):
    return list(generate.generate_pairs(n, length, error=error, seed=seed,
                                        length_diff=length_diff))


def _raw(s):
    return np.frombuffer(s.encode("ascii"), dtype=np.uint8)


def _prep(pats, txts, cutoffs, **kw):
    """Bucket every test batch to shared pow2 shapes: one XLA compile
    serves the whole parameter matrix."""
    kw.setdefault("min_nb", 16)
    kw.setdefault("min_ebb", 16)
    kw.setdefault("pad_to_b", 8)
    return prepare_banded_batch(pats, txts, cutoffs, **kw)


@pytest.mark.parametrize("length,error,seed,ldiff,bw", [
    (100, 0.1, 1, 1.0, 40),
    (200, 0.1, 2, 1.0, 40),
    (300, 0.15, 3, 1.2, 40),
    (129, 0.1, 4, 0.8, 40),
    (500, 0.1, 5, 1.0, 15),
    (1000, 0.1, 6, 1.0, 15),
])
def test_banded_jax_score_parity(length, error, seed, ldiff, bw):
    pairs = _pairs(6, length, error, seed, length_diff=ldiff)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [max(len(p), len(t)) * bw // 100 for p, t in pairs]
    batch = _prep(pats, txts, cutoffs, full=False)
    out = run_banded(batch)
    scores = extract_final_scores(batch, out["scores_by_k"])
    for i, (p, t) in enumerate(pairs):
        model = myers_np.banded_score(
            myers_np.compile_pattern(p), dna.encode(t), cutoffs[i])
        assert scores[i] == model.score, (i, p, t)


def test_banded_jax_score_final_band_state():
    # The Hirschberg driver consumes the final live column + band edges:
    # they must match the model exactly.
    pairs = _pairs(4, 400, 0.12, 7)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [max(len(p), len(t)) * 40 // 100 for p, t in pairs]
    batch = _prep(pats, txts, cutoffs, full=False)
    out = run_banded(batch)
    for i, (p, t) in enumerate(pairs):
        model = myers_np.banded_score(
            myers_np.compile_pattern(p), dna.encode(t), cutoffs[i])
        assert int(out["first"][i]) == model.lower_block
        assert int(out["last"][i]) == model.higher_block
        for j in range(model.lower_block, model.higher_block + 1):
            got = int(out["pv_lo"][j, i]) | (int(out["pv_hi"][j, i]) << 32)
            assert got == model.Pv[j], (i, j)
            gotm = int(out["mv_lo"][j, i]) | (int(out["mv_hi"][j, i]) << 32)
            assert gotm == model.Mv[j], (i, j)


def test_banded_jax_score_text_finish():
    # Hirschberg midpoint stops: process only `finish` columns while the
    # band is sized for the full text length.
    pairs = _pairs(3, 600, 0.1, 8)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [90] * 3
    finishes = [len(t) // 2 for t in txts]
    batch = _prep(pats, txts, cutoffs, full=False, text_finish=finishes)
    out = run_banded(batch)
    for i, (p, t) in enumerate(pairs):
        model = myers_np.banded_score(
            myers_np.compile_pattern(p), dna.encode(t), cutoffs[i],
            text_len=len(t), text_finish_pos=finishes[i])
        assert int(out["first"][i]) == model.lower_block
        assert int(out["last"][i]) == model.higher_block
        for j in range(model.lower_block, model.higher_block + 1):
            got = int(out["pv_lo"][j, i]) | (int(out["pv_hi"][j, i]) << 32)
            assert got == model.Pv[j], (i, j)


@pytest.mark.parametrize("length,error,seed,ldiff", [
    (100, 0.1, 11, 1.0),
    (200, 0.15, 12, 1.0),
    (300, 0.1, 13, 1.2),
    (150, 0.1, 14, 0.8),
])
def test_banded_jax_full_traceback_parity(length, error, seed, ldiff):
    pairs = _pairs(5, length, error, seed, length_diff=ldiff)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [max(len(p), len(t)) * 40 // 100 for p, t in pairs]
    batch = _prep(pats, txts, cutoffs, full=True)
    out = run_banded(batch)
    scores = extract_final_scores(batch, out["scores_by_k"])
    for i, (p, t) in enumerate(pairs):
        mscore, mops = myers_np.banded_align(p, t, cutoffs[i])
        assert scores[i] == mscore
        ops = banded_traceback_pair(
            out["mat_pv_lo"][:, :, i], out["mat_pv_hi"][:, :, i],
            out["mat_mv_lo"][:, :, i], out["mat_mv_hi"][:, :, i],
            _raw(p), _raw(t), int(batch.prolog[i]))
        assert ops == mops, (i, p, t)
        c = Cigar(operations=ops)
        assert c.check_alignment(p, t)


def test_banded_jax_mixed_length_bucket():
    # One bucket with very different lengths: padding lanes must not
    # perturb live lanes.
    pairs = (_pairs(2, 80, 0.1, 15) + _pairs(2, 500, 0.1, 16)
             + _pairs(1, 257, 0.2, 17))
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [max(len(p), len(t)) * 30 // 100 for p, t in pairs]
    batch = _prep(pats, txts, cutoffs, full=False)
    out = run_banded(batch)
    scores = extract_final_scores(batch, out["scores_by_k"])
    for i, (p, t) in enumerate(pairs):
        model = myers_np.banded_score(
            myers_np.compile_pattern(p), dna.encode(t), cutoffs[i])
        assert scores[i] == model.score
