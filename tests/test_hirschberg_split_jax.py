"""Device-side Hirschberg midpoint epilogue vs the numpy spec.

hirschberg_split_batch must reproduce myers_np.hirschberg_split_fast
(bit-exact: the same first-argmin midpoint and sub-score bounds, and
the same feasibility verdict) over the real band states the driver
holds — built here exactly as aligner/hirschberg.py builds them
(merged fwd+rev banded_score_results batches)."""

import numpy as np

from quicked_tpu import generate
from quicked_tpu.aligner.batch import banded_score_results
from quicked_tpu.ops import myers_np
from quicked_tpu.ops.hirschberg_split_jax import hirschberg_split_batch

W = 64


def _next_pow2(x):
    return 1 << max(int(x) - 1, 0).bit_length()


def _states_to_planes(states, EBB, K1):
    B = len(states)
    pv_lo = np.zeros((EBB, B), np.uint32)
    pv_hi = np.zeros((EBB, B), np.uint32)
    mv_lo = np.zeros((EBB, B), np.uint32)
    mv_hi = np.zeros((EBB, B), np.uint32)
    scores = np.zeros((K1, B), np.int32)
    for j, st in enumerate(states):
        e = len(st.pv64)
        pv_lo[:e, j] = (st.pv64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        pv_hi[:e, j] = (st.pv64 >> np.uint64(32)).astype(np.uint32)
        mv_lo[:e, j] = (st.mv64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        mv_hi[:e, j] = (st.mv64 >> np.uint64(32)).astype(np.uint32)
        sk = np.asarray(st.scores_k, np.int64)
        scores[:len(sk), j] = sk[:K1]
        # rows past the kernel's window hold the init formula — the
        # spec's out-of-dict fallback (row + 1) * 64 in shifted frame
        k = np.arange(len(sk), K1)
        scores[len(sk):, j] = (k - st.prolog + 1) * W
    return pv_lo, pv_hi, mv_lo, mv_hi, scores


def _split_case(pairs, cutoffs):
    """Build fwd/rev states the way aligner/hirschberg.py does and
    compare the batched device epilogue against the spec per pair."""
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    mids = [(len(t) + 1) // 2 for t in txts]
    mids_r = [len(t) - m for t, m in zip(txts, mids)]
    both = banded_score_results(
        pats + [p[::-1] for p in pats],
        txts + [t[::-1] for t in txts],
        list(cutoffs) + list(cutoffs), text_finish=mids + mids_r)
    n = len(pairs)
    fwd, rev = both[:n], both[n:]

    EBB = _next_pow2(max(len(f.pv64) for f in fwd))
    K1 = max(max(len(f.scores_k) for f in fwd),
             max(len(r.scores_k) for r in rev))
    f_planes = _states_to_planes(fwd, EBB, K1)
    r_planes = _states_to_planes(rev, EBB, K1)

    i32 = lambda xs: np.asarray(xs, np.int32)
    pll, sl, sr, ok = hirschberg_split_batch(
        *f_planes[:4], i32([f.first for f in fwd]),
        i32([f.last for f in fwd]), f_planes[4],
        *r_planes[:4], i32([r.first for r in rev]),
        i32([r.last for r in rev]), r_planes[4],
        i32([f.prolog for f in fwd]),
        i32([len(f.pv64) for f in fwd]),
        i32([len(p) for p in pats]), i32([len(t) for t in txts]),
        EBB=EBB)
    pll, sl, sr, ok = (np.asarray(pll), np.asarray(sl), np.asarray(sr),
                       np.asarray(ok))

    n_feasible = 0
    for j in range(n):
        f, r = fwd[j], rev[j]
        want = myers_np.hirschberg_split_fast(
            f.pv64, f.mv64, f.first, f.last, f.scores_k,
            r.pv64, r.mv64, r.first, r.last, r.scores_k,
            f.prolog, len(pats[j]), len(txts[j]))
        if want is None:
            assert not ok[j], f"pair {j}: spec infeasible, batch ok"
            continue
        n_feasible += 1
        assert ok[j], f"pair {j}: spec feasible, batch not"
        assert (int(pll[j]), int(sl[j]), int(sr[j])) == want, \
            (j, (int(pll[j]), int(sl[j]), int(sr[j])), want)
    return n_feasible


def test_split_batch_matches_spec_across_regimes():
    total = 0
    for n, L, err, bw, seed in ((6, 900, 0.10, 15, 3),
                                (4, 2500, 0.15, 10, 7),
                                (5, 400, 0.05, 25, 11),
                                (3, 6000, 0.12, 15, 13)):
        pairs = list(generate.generate_pairs(n, L, error=err, seed=seed))
        cutoffs = [max(len(p), len(t)) * bw // 100 for p, t in pairs]
        total += _split_case(pairs, cutoffs)
    assert total >= 12          # the comparison exercised real splits


def test_split_batch_flags_infeasible_lanes():
    """Synthetic band states whose half-pass frontiers miss each other:
    the spec returns None and the batch lane must flag feasible=False
    through the identical window-overlap condition. Built from a real
    state (so geometry fields are coherent) with first/last pushed to
    non-overlapping extremes."""
    pairs = list(generate.generate_pairs(2, 900, error=0.1, seed=3))
    cutoffs = [max(len(p), len(t)) * 15 // 100 for p, t in pairs]
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    mids = [(len(t) + 1) // 2 for t in txts]
    both = banded_score_results(
        pats + [p[::-1] for p in pats],
        txts + [t[::-1] for t in txts],
        cutoffs + cutoffs,
        text_finish=mids + [len(t) - m for t, m in zip(txts, mids)])
    fwd, rev = both[:2], both[2:]
    # push the forward band's window fully past the reverse one
    e = len(fwd[0].pv64)
    fwd[0].first, fwd[0].last = e - 1, e - 1
    rev[0].first, rev[0].last = 0, 0
    spec = [myers_np.hirschberg_split_fast(
        f.pv64, f.mv64, f.first, f.last, f.scores_k,
        r.pv64, r.mv64, r.first, r.last, r.scores_k,
        f.prolog, len(p), len(t))
        for f, r, (p, t) in zip(fwd, rev, pairs)]
    assert spec[0] is None and spec[1] is not None

    EBB = _next_pow2(max(len(f.pv64) for f in fwd))
    K1 = max(len(f.scores_k) for f in fwd + rev)
    f_planes = _states_to_planes(fwd, EBB, K1)
    r_planes = _states_to_planes(rev, EBB, K1)
    i32 = lambda xs: np.asarray(xs, np.int32)
    pll, sl, sr, ok = hirschberg_split_batch(
        *f_planes[:4], i32([f.first for f in fwd]),
        i32([f.last for f in fwd]), f_planes[4],
        *r_planes[:4], i32([r.first for r in rev]),
        i32([r.last for r in rev]), r_planes[4],
        i32([f.prolog for f in fwd]),
        i32([len(f.pv64) for f in fwd]),
        i32([len(p) for p in pats]), i32([len(t) for t in txts]),
        EBB=EBB)
    assert not bool(np.asarray(ok)[0])
    assert bool(np.asarray(ok)[1])
    assert (int(np.asarray(pll)[1]), int(np.asarray(sl)[1]),
            int(np.asarray(sr)[1])) == spec[1]


def test_level_splits_batch_path_matches_per_pair(monkeypatch):
    """hirschberg_batch with the batched level-split op engaged (>= 8
    split tasks) returns exactly what the per-pair spec path returns —
    statuses, partial-CIGAR failure bytes, and full CIGARs."""
    from quicked_tpu.aligner import hirschberg as hmod

    # run the batched op inline (no cold-shape deferral to the numpy
    # path — this test exists to exercise the op through the driver)
    monkeypatch.setenv("QUICKED_TPU_ASYNC_WARMUP", "0")
    pairs = list(generate.generate_pairs(10, 700, error=0.12, seed=37))
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [max(len(p), len(t)) * 15 // 100 for p, t in pairs]
    monkeypatch.setattr(hmod, "HIRSCHBERG_BUFFER_SIZE", 1 << 14)
    monkeypatch.setattr(hmod, "_SPLIT_BATCH_MIN", 8)
    res_batched = hmod.hirschberg_batch(txts, pats, cutoffs)
    monkeypatch.setattr(hmod, "_SPLIT_BATCH_MIN", 10 ** 9)
    res_per_pair = hmod.hirschberg_batch(txts, pats, cutoffs)
    assert res_batched == res_per_pair
    assert any(ops for _, ops in res_batched)


def test_split_batch_randomized_soak():
    """Wider randomized sweep: every feasible midpoint across mixed
    lengths/error rates/bandwidths matches the spec exactly."""
    rng = np.random.default_rng(99)
    total = 0
    for trial in range(6):
        n = int(rng.integers(3, 7))
        L = int(rng.integers(200, 4000))
        err = float(rng.uniform(0.02, 0.2))
        bw = int(rng.integers(8, 40))
        pairs = list(generate.generate_pairs(n, L, error=err,
                                             seed=100 + trial))
        cutoffs = [max(len(p), len(t)) * bw // 100 for p, t in pairs]
        total += _split_case(pairs, cutoffs)
    assert total >= 15
