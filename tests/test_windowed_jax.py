"""Parity tests: the batched JAX windowed kernel vs the exact numpy model
(score, high-error-window count)."""

import numpy as np
import pytest

from quicked_tpu import generate
from quicked_tpu.ops import myers_np
from quicked_tpu.ops.windowed_jax import prepare_windowed_batch, run_windowed_score


def _pairs(n, length, error, seed, length_diff=1.0):
    return list(generate.generate_pairs(n, length, error=error, seed=seed,
                                        length_diff=length_diff))


def _prep(pats, txts, ws):
    """Shared pow2 shapes: one compile per (ws, ovl) config across the
    whole parameter matrix."""
    size = 2048
    return prepare_windowed_batch(pats, txts, window_size=ws, pad_to_b=8,
                                  min_t=size, min_p=size,
                                  min_kp=size // 64 + 1)


@pytest.mark.parametrize("ws,ovl,length,error,seed,ldiff", [
    (2, 1, 150, 0.05, 1, 1.0),
    (2, 1, 300, 0.1, 2, 1.0),
    (2, 1, 400, 0.2, 3, 1.2),
    (2, 1, 129, 0.1, 4, 0.8),
    (9, 1, 700, 0.1, 5, 1.0),
    (9, 1, 1200, 0.15, 6, 1.0),
    (3, 2, 300, 0.1, 7, 1.0),
])
def test_windowed_jax_score_parity(ws, ovl, length, error, seed, ldiff):
    pairs = _pairs(6, length, error, seed, length_diff=ldiff)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    batch = _prep(pats, txts, ws)
    score, hew = run_windowed_score(batch, 40, ws, ovl)
    for i, (p, t) in enumerate(pairs):
        ms, _, mhew = myers_np.windowed_compute(p, t, 40, ws, ovl,
                                                score_only=True)
        assert score[i] == ms, (i, p, t)
        assert hew[i] == mhew, (i, p, t)


def test_windowed_jax_mixed_lengths():
    pairs = (_pairs(2, 80, 0.1, 11) + _pairs(2, 500, 0.15, 12)
             + _pairs(2, 257, 0.05, 13, 1.3))
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    batch = _prep(pats, txts, 2)
    score, hew = run_windowed_score(batch, 40, 2, 1)
    for i, (p, t) in enumerate(pairs):
        ms, _, mhew = myers_np.windowed_compute(p, t, 40, 2, 1,
                                                score_only=True)
        assert score[i] == ms
        assert hew[i] == mhew


@pytest.mark.parametrize("ws,ovl,length,error,seed,ldiff", [
    (2, 1, 150, 0.08, 21, 1.0),
    (2, 1, 300, 0.15, 22, 1.2),
    (9, 1, 700, 0.1, 23, 1.0),
    (3, 2, 260, 0.1, 24, 0.8),
])
def test_windowed_jax_full_cigar_parity(ws, ovl, length, error, seed, ldiff):
    from quicked_tpu.ops.windowed_jax import run_windowed_full

    pairs = _pairs(5, length, error, seed, length_diff=ldiff)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    batch = _prep(pats, txts, ws)
    ops = run_windowed_full(batch, ws, ovl)
    for i, (p, t) in enumerate(pairs):
        _, mops, _ = myers_np.windowed_compute(p, t, 0, ws, ovl,
                                               score_only=False)
        assert ops[i] == mops, (i, p, t)


@pytest.mark.parametrize("ws,ovl", [(2, 1), (3, 1), (2, 0)])
def test_windowed_jax_extreme_indels(ws, ovl):
    """Long D/I runs: the column-scan backtrace consumes whole D runs
    with bit arithmetic (run clamping at the v-overlap exit, block-
    crossing runs) — drive it with patterns that are pure deletions /
    insertions of each other, plus N-char raw-compare cases."""
    rng = np.random.default_rng(31 + ws)
    pats, txts = [], []
    for k in range(3):
        pl = int(rng.integers(150, 400))
        tl = int(rng.integers(5, pl // 2))
        p = "".join(rng.choice(list("ACGT"), pl))
        tp = int(rng.integers(0, pl - tl + 1))
        pats.append(p)
        txts.append(p[tp:tp + tl])               # deletion-heavy
    for k in range(2):
        tl = int(rng.integers(150, 400))
        pl = int(rng.integers(5, tl // 2))
        t = "".join(rng.choice(list("ACGTN"), tl))
        pats.append(t[:pl].replace("A", "N"))    # insertion-heavy + N
        txts.append(t)
    pats.append("A" * 200)                       # all-D column runs
    txts.append("C" * 3)
    batch = _prep(pats, txts, ws)
    score, hew = run_windowed_score(batch, 40, ws, ovl)
    for i, (p, t) in enumerate(zip(pats, txts)):
        ms, _, mhew = myers_np.windowed_compute(p, t, 40, ws, ovl,
                                                score_only=True)
        assert score[i] == ms, (i, len(p), len(t))
        assert hew[i] == mhew, (i, len(p), len(t))


@pytest.mark.parametrize("ws,ovl", [(2, 1), (3, 1)])
def test_windowed_jax_full_extreme_indels(ws, ovl):
    """Full-CIGAR mode through the record-emitting column scan: long
    D/I runs, M-outranks-D tie-break on match columns, N chars."""
    from quicked_tpu.ops.windowed_jax import run_windowed_full

    rng = np.random.default_rng(47 + ws)
    pats, txts = [], []
    for k in range(2):
        pl = int(rng.integers(150, 350))
        tl = int(rng.integers(5, pl // 2))
        p = "".join(rng.choice(list("ACGTN"), pl))
        tp = int(rng.integers(0, pl - tl + 1))
        pats.append(p)
        txts.append(p[tp:tp + tl])
        pats.append(p[tp:tp + tl])
        txts.append(p)
    pats.append("A" * 150)
    txts.append("C" * 4)
    batch = _prep(pats, txts, ws)
    ops = run_windowed_full(batch, ws, ovl)
    for i, (p, t) in enumerate(zip(pats, txts)):
        _, mops, _ = myers_np.windowed_compute(p, t, 0, ws, ovl,
                                               score_only=False)
        assert ops[i] == mops, (i, len(p), len(t))


@pytest.mark.parametrize("min_t", [None, 160, 2048])
def test_windowed_jax_lane_window_paths(min_t):
    """Parity across the three _lane_windows implementations: T == COLS
    identity (min_t None: 100 bp pairs pad to exactly one window),
    small T - COLS masked shifts (min_t 160 -> T-COLS = 32), and the
    general gather (min_t 2048)."""
    pairs = _pairs(5, 100, 0.1, 33) + _pairs(3, 120, 0.3, 34, 0.8)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    kw = {}
    if min_t:
        kw = dict(min_t=min_t, min_p=min_t, min_kp=min_t // 64 + 1)
    batch = prepare_windowed_batch(pats, txts, window_size=2, pad_to_b=8,
                                   **kw)
    score, hew = run_windowed_score(batch, 40, 2, 1)
    for i, (p, t) in enumerate(pairs):
        ms, _, mhew = myers_np.windowed_compute(p, t, 40, 2, 1,
                                                score_only=True)
        assert score[i] == ms, (i, min_t)
        assert hew[i] == mhew, (i, min_t)


def test_windowed_jax_short_pairs():
    # Pairs much shorter than one window.
    pairs = _pairs(4, 30, 0.1, 14) + _pairs(2, 64, 0.2, 15)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    batch = _prep(pats, txts, 2)
    score, hew = run_windowed_score(batch, 40, 2, 1)
    for i, (p, t) in enumerate(pairs):
        ms, _, mhew = myers_np.windowed_compute(p, t, 40, 2, 1,
                                                score_only=True)
        assert score[i] == ms
        assert hew[i] == mhew
